"""Retention (partition drop) and small-file compaction on a date-partitioned
parquet table — exercised through the Hadoop FileSystem API, including an
explicit ``file:/``-scheme path (the same code path serves hdfs:// / s3a://)."""

from pyspark.sql import functions as F

from trading_etl_spark.plans.maintenance import (
    compact_partition,
    drop_partitions_before,
    list_partitions,
)


def _write_partitioned(spark, path, n_files=6):
    df = spark.range(600).select(
        F.element_at(
            F.array(F.lit("2024-01-01"), F.lit("2024-01-02"), F.lit("2024-01-03")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("dt"),
        F.col("id").alias("v"),
    )
    df.repartition(n_files).write.mode("overwrite").partitionBy("dt").parquet(path)


def test_retention_drops_old_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_partitioned(spark, path)
    assert list_partitions(spark, path, "dt") == [
        "2024-01-01",
        "2024-01-02",
        "2024-01-03",
    ]

    dropped = drop_partitions_before(spark, path, "dt", "2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    assert list_partitions(spark, path, "dt") == ["2024-01-03"]
    left = spark.read.parquet(path)
    assert left.count() == 200
    assert left.filter(F.col("dt") != "2024-01-03").count() == 0


def test_compaction_preserves_rows(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    _write_partitioned(spark, path, n_files=8)
    part = f"{path}/dt=2024-01-01"
    before_rows = sorted(r["v"] for r in spark.read.parquet(part).collect())
    n_files_before = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert n_files_before > 1

    nb, na = compact_partition(spark, path, "dt", "2024-01-01", target_file_bytes=10**9)
    assert (nb, na) == (n_files_before, 1)
    after_rows = sorted(r["v"] for r in spark.read.parquet(part).collect())
    assert after_rows == before_rows
    # whole-table read still sees every partition
    assert spark.read.parquet(path).count() == 600


def test_compaction_survives_writer_debris(spark, tmp_path):
    """r11 regression (same class as the compaction_plan dry-run fix): a
    live partition accumulates .tmp leftovers from abandoned writers; the
    rewrite must not crash parsing them as parquet, must preserve every
    committed row, and — because the swap replaces the directory — drops
    the debris with the old files (rewrite subsumes the vacuum)."""
    import os

    path = str(tmp_path / "t")
    _write_partitioned(spark, path, n_files=8)
    part = f"{path}/dt=2024-01-01"
    before_rows = sorted(r["v"] for r in spark.read.parquet(part).collect())
    with open(os.path.join(part, "part-orphan-0.tmp"), "w") as f:
        f.write("abandoned writer leftover")

    nb, na = compact_partition(spark, path, "dt", "2024-01-01", target_file_bytes=10**9)
    assert na == 1
    after_rows = sorted(r["v"] for r in spark.read.parquet(part).collect())
    assert after_rows == before_rows
    assert not any(f.endswith(".tmp") for f in os.listdir(part))


def test_maintenance_through_file_scheme_uri(spark, tmp_path):
    """Same contract through an explicit Hadoop URI, not a bare local path."""
    path = "file://" + str(tmp_path / "t")
    _write_partitioned(spark, path, n_files=6)
    assert list_partitions(spark, path, "dt") == [
        "2024-01-01",
        "2024-01-02",
        "2024-01-03",
    ]
    nb, na = compact_partition(spark, path, "dt", "2024-01-02", target_file_bytes=10**9)
    assert nb > 1 and na == 1
    dropped = drop_partitions_before(spark, path, "dt", "2024-01-02")
    assert dropped == ["2024-01-01"]
    assert spark.read.parquet(path).count() == 400


def test_maintain_streaming_sink_retention_and_compaction(spark, tmp_path):
    """T11 end-to-end over REAL streaming output: date-partitioned ingest
    accretes one small file per micro-batch per date; the sweep drops
    out-of-horizon dates and folds each surviving partition's files."""
    import json

    from trading_etl_spark.plans.maintenance import maintain_table
    from trading_etl_spark.streaming.ticks import start_tick_ingest_maintained

    def frame(day, sec, bid):
        return json.dumps(
            {
                "type": "ticker",
                "symbol": "USD_JPY",
                "timestamp": f"2024-01-{day:02d}T10:00:{sec:02d}.000Z",
                "bid": str(bid),
                "ask": str(bid + 0.2),
            }
        )

    src = tmp_path / "in"
    src.mkdir()
    sink, ckpt = str(tmp_path / "ticks"), str(tmp_path / "ckpt")
    # two ingest runs = two micro-batches = >=2 files in each touched date
    for batch in range(2):
        lines = [frame(day, batch, 100.0 + day) for day in (1, 2, 3)]
        (src / f"frames-{batch}.jsonl").write_text("\n".join(lines) + "\n")
        # wide watermark: the replayed days must not be dropped as late
        start_tick_ingest_maintained(
            spark, str(src), sink, ckpt, watermark="5 days"
        ).awaitTermination()

    assert list_partitions(spark, sink, "dt") == [
        "2024-01-01",
        "2024-01-02",
        "2024-01-03",
    ]
    files_before = len(fs_file_names(spark, f"{sink}/dt=2024-01-02"))
    assert files_before >= 2  # one per micro-batch

    report = maintain_table(spark, sink, "dt", "2024-01-02", target_file_bytes=10**9)
    assert report["dropped"] == ["2024-01-01"]
    assert set(report["compacted"]) == {"2024-01-02", "2024-01-03"}
    assert report["compacted"]["2024-01-02"] == (files_before, 1)

    left = spark.read.parquet(sink)
    assert left.count() == 4  # 2 seconds × 2 surviving days
    assert left.filter(F.col("dt") == "2024-01-01").count() == 0
    # idempotent: second sweep drops nothing, compacts nothing further
    again = maintain_table(spark, sink, "dt", "2024-01-02", target_file_bytes=10**9)
    assert again["dropped"] == [] and all(
        b == a for b, a in again["compacted"].values()
    )


def fs_file_names(spark, part_dir):
    from trading_etl_spark import fs

    return [n for n in fs.list_names(spark, part_dir) if n.endswith(".parquet")]


def test_maintained_sink_replay_is_exactly_once(spark, tmp_path):
    """Losing the checkpoint and replaying the whole backlog must not
    duplicate rows: the maintained sink's exactly-once comes from the W1
    (pair, second) first-wins key contract, not from sink state."""
    import json

    from trading_etl_spark.streaming.ticks import start_tick_ingest_maintained

    src = tmp_path / "in"
    src.mkdir()
    frames = [
        json.dumps(
            {
                "type": "ticker",
                "symbol": "USD_JPY",
                "timestamp": f"2024-01-01T10:00:{s:02d}.000Z",
                "bid": "100.5",
                "ask": "100.7",
            }
        )
        for s in range(5)
    ]
    (src / "frames.jsonl").write_text("\n".join(frames) + "\n")
    sink = str(tmp_path / "ticks")
    start_tick_ingest_maintained(
        spark, str(src), sink, str(tmp_path / "ckpt1")
    ).awaitTermination()
    assert spark.read.parquet(sink).count() == 5
    # fresh checkpoint → the file source replays EVERYTHING; W1 dedups it
    start_tick_ingest_maintained(
        spark, str(src), sink, str(tmp_path / "ckpt2")
    ).awaitTermination()
    got = spark.read.parquet(sink)
    assert got.count() == 5
    assert got.select("currency_pair_symbol", "time").distinct().count() == 5


def test_maintain_table_refuses_streaming_sink_log(spark, tmp_path):
    """A direct file-sink table (_spark_metadata) must be rejected: its log
    pins file names that retention/compaction would delete or rename."""
    import pytest

    from trading_etl_spark.plans.maintenance import maintain_table

    path = str(tmp_path / "t")
    _write_partitioned(spark, path)
    (tmp_path / "t" / "_spark_metadata").mkdir()
    with pytest.raises(ValueError, match="_spark_metadata"):
        maintain_table(spark, path, "dt", "2024-01-02")


def test_no_posix_path_calls_in_write_path():
    """The write path must never touch os.path/shutil — it has to run
    against hdfs:///s3a:// tables where those operate on the wrong world."""
    import ast
    import inspect

    from trading_etl_spark import io
    from trading_etl_spark.plans import maintenance

    for mod in (io, maintenance):
        tree = ast.parse(inspect.getsource(mod))
        offenders = [
            node.names[0].name
            for node in ast.walk(tree)
            if isinstance(node, (ast.Import, ast.ImportFrom))
            for alias in node.names
            if (alias.name or "").split(".")[0] in ("os", "shutil")
            or (getattr(node, "module", "") or "").split(".")[0] in ("os", "shutil")
        ]
        assert not offenders, f"{mod.__name__} imports {offenders}"


def test_read_evolved_additive_column(spark, tmp_path):
    """Alembic-style additive migration: later files carry calc_version,
    older rows surface it as NULL — no rewrite of existing data."""
    from trading_etl_spark.plans.maintenance import read_evolved

    path = str(tmp_path / "fact")
    spark.createDataFrame(
        [("USD/JPY", 100.0)], "currency_pair_code string, value double"
    ).write.parquet(path)
    spark.createDataFrame(
        [("EUR/JPY", 160.0, "v2")],
        "currency_pair_code string, value double, calc_version string",
    ).write.mode("append").parquet(path)

    merged = read_evolved(spark, path)
    assert set(merged.columns) == {"currency_pair_code", "value", "calc_version"}
    vals = {r["currency_pair_code"]: r["calc_version"] for r in merged.collect()}
    assert vals == {"USD/JPY": None, "EUR/JPY": "v2"}

    # contract-schema path: no footer sweep, same result
    ddl = "currency_pair_code string, value double, calc_version string"
    by_contract = read_evolved(spark, path, ddl)
    assert by_contract.count() == 2


def test_compaction_recovers_mid_swap_crash(spark, tmp_path):
    """VERDICT r4 task #3: crash between the two swap renames parks the live
    partition at the aside name. The next compact_partition call must detect
    the parked dir, restore it, and complete normally — no data loss."""
    from trading_etl_spark import fs

    path = str(tmp_path / "t")
    _write_partitioned(spark, path, n_files=8)
    part = f"{path}/dt=2024-01-01"
    aside = f"{path}/_compact_old_dt=2024-01-01"
    rows = sorted(r["v"] for r in spark.read.parquet(part).collect())
    # simulate the crash window: live → aside happened, tmp → live did not
    assert fs.rename(spark, part, aside)
    assert not fs.exists(spark, part)

    nb, na = compact_partition(spark, path, "dt", "2024-01-01", target_file_bytes=10**9)
    assert nb > 1 and na == 1
    assert sorted(r["v"] for r in spark.read.parquet(part).collect()) == rows
    assert not fs.exists(spark, aside)
    assert not fs.exists(spark, f"{path}/_compact_tmp_dt=2024-01-01")


def test_compaction_cleans_completed_swap_leftovers(spark, tmp_path):
    """Crash after the swap completed but before the aside delete: the stale
    aside copy (and any stale tmp dir) is dropped; the live partition — the
    already-compacted data — is untouched."""
    from trading_etl_spark import fs

    path = str(tmp_path / "t")
    _write_partitioned(spark, path, n_files=8)
    part = f"{path}/dt=2024-01-02"
    compact_partition(spark, path, "dt", "2024-01-02", target_file_bytes=10**9)
    rows = sorted(r["v"] for r in spark.read.parquet(part).collect())
    aside = f"{path}/_compact_old_dt=2024-01-02"
    tmp = f"{path}/_compact_tmp_dt=2024-01-02"
    spark.range(3).write.parquet(aside)  # stale leftovers from the old run
    spark.range(2).write.parquet(tmp)

    nb, na = compact_partition(spark, path, "dt", "2024-01-02", target_file_bytes=10**9)
    assert (nb, na) == (1, 1)  # already compact after recovery: short-circuit
    assert not fs.exists(spark, aside) and not fs.exists(spark, tmp)
    assert sorted(r["v"] for r in spark.read.parquet(part).collect()) == rows


def test_maintained_sink_retention_cutoff_blocks_replay_resurrection(spark, tmp_path):
    """ADVICE r4: after retention drops a partition, a micro-batch replayed
    from a stale checkpoint would pass the first-wins gate (existing side
    deleted + range-pruned) and silently recreate the expired partition.
    With retention_cutoff the foreachBatch drops expired rows first."""
    import json

    from trading_etl_spark.plans.maintenance import maintain_table
    from trading_etl_spark.streaming.ticks import start_tick_ingest_maintained

    def frame(day):
        return json.dumps(
            {
                "type": "ticker",
                "symbol": "USD_JPY",
                "timestamp": f"2024-01-{day:02d}T10:00:00.000Z",
                "bid": "100.5",
                "ask": "100.7",
            }
        )

    src = tmp_path / "in"
    src.mkdir()
    (src / "frames.jsonl").write_text("\n".join(frame(d) for d in (1, 2, 3)) + "\n")
    sink = str(tmp_path / "ticks")
    start_tick_ingest_maintained(
        spark, str(src), sink, str(tmp_path / "c1"), watermark="5 days"
    ).awaitTermination()
    maintain_table(spark, sink, "dt", "2024-01-02", target_file_bytes=10**9)
    assert list_partitions(spark, sink, "dt") == ["2024-01-02", "2024-01-03"]

    # fresh checkpoint = full replay of the backlog, now with the cutoff
    start_tick_ingest_maintained(
        spark, str(src), sink, str(tmp_path / "c2"),
        watermark="5 days", retention_cutoff="2024-01-02",
    ).awaitTermination()
    assert list_partitions(spark, sink, "dt") == ["2024-01-02", "2024-01-03"]
    assert spark.read.parquet(sink).count() == 2


def test_freshness_report_flags_stale_groups(spark):
    from datetime import datetime

    from trading_etl_spark.plans.maintenance import freshness_report

    rows = [
        ("USD/JPY", datetime(2024, 1, 1, 11, 59, 30)),
        ("USD/JPY", datetime(2024, 1, 1, 11, 58, 0)),
        ("EUR/JPY", datetime(2024, 1, 1, 11, 30, 0)),  # 30 min behind
    ]
    df = spark.createDataFrame(rows, "currency_pair_code string, time timestamp")
    rep = {
        r.currency_pair_code: r
        for r in freshness_report(
            df, datetime(2024, 1, 1, 12, 0, 0), expected_interval_s=120
        ).collect()
    }
    assert rep["USD/JPY"].lag_seconds == 30 and not rep["USD/JPY"].stale
    assert rep["EUR/JPY"].lag_seconds == 1800 and rep["EUR/JPY"].stale


def test_retention_plan_classifies_partitions(spark):
    from datetime import datetime

    from trading_etl_spark.plans.maintenance import retention_plan

    rows = [
        (datetime(2024, 1, 10, 5), 1.0),
        (datetime(2024, 1, 10, 9), 2.0),
        (datetime(2024, 1, 15, 0), 3.0),   # on the cutoff → keep
        (datetime(2024, 1, 20, 12), 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    plan = {
        r["partition_value"]: r
        for r in retention_plan(df, "ts", "2024-01-15").collect()
    }
    assert plan["2024-01-10"]["action"] == "drop"
    assert plan["2024-01-10"]["n_rows"] == 2
    assert plan["2024-01-15"]["action"] == "keep"  # cutoff day survives
    assert plan["2024-01-20"]["action"] == "keep"
    assert plan["2024-01-10"]["min_ts"] == datetime(2024, 1, 10, 5)


def test_compaction_plan_rows_mode_models_real_listing(spark, tmp_path):
    """Rows mode (the oracle-gate twin): over a maxRecordsPerFile fixture,
    files_before must equal ceil(rows/N) from the REAL listing, targets
    ceil(rows/M), and the action matches compact_partition's decision rule
    (target < before => compact)."""
    from trading_etl_spark.plans.maintenance import compaction_plan

    path = str(tmp_path / "t")
    df = spark.range(330).select(
        F.element_at(
            F.array(F.lit("2024-01-01"), F.lit("2024-01-02"), F.lit("2024-01-03")),
            F.when(F.col("id") < 300, 1).when(F.col("id") < 320, 2).otherwise(3).cast("int"),
        ).alias("dt"),
        F.col("id").alias("v"),
    )
    (
        df.repartition(1)
        .sortWithinPartitions("dt")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 50)
        .partitionBy("dt")
        .parquet(path)
    )
    got = {
        r["partition_value"]: (r["n_rows"], r["files_before"], r["target_files"], r["action"])
        for r in compaction_plan(spark, path, "dt", rows_per_file=200).collect()
    }
    assert got == {
        "2024-01-01": (300, 6, 2, "compact"),  # 300 rows: ceil/50=6, ceil/200=2
        "2024-01-02": (20, 1, 1, "skip"),
        "2024-01-03": (10, 1, 1, "skip"),
    }

    # writer debris must change NOTHING: a real table accumulates .tmp
    # leftovers from abandoned writers, and the dry-run's row-count scan
    # must neither crash on them (they aren't parquet) nor count them in
    # files_before. r11 regression: the shared oracle fixture broke when
    # events_orphan_files planted debris before events_compaction_plan ran.
    (tmp_path / "t" / "dt=2024-01-01" / "part-orphan-0.tmp").write_text(
        "abandoned writer leftover"
    )
    got_with_debris = {
        r["partition_value"]: (r["n_rows"], r["files_before"], r["target_files"], r["action"])
        for r in compaction_plan(spark, path, "dt", rows_per_file=200).collect()
    }
    assert got_with_debris == got


def test_compaction_plan_bytes_mode_agrees_with_compact_partition(spark, tmp_path):
    """Bytes mode (production parity): same max(1, ceil(bytes/target))
    arithmetic as compact_partition — for every partition the dry-run's
    (files_before, target) must equal what compact_partition then DOES."""
    from trading_etl_spark.plans.maintenance import compaction_plan, compact_partition

    path = str(tmp_path / "t")
    _write_partitioned(spark, path, n_files=8)
    target_bytes = 64 * 1024  # small enough that some partitions skip
    plan = {
        r["partition_value"]: r
        for r in compaction_plan(
            spark, path, "dt", target_file_bytes=target_bytes
        ).collect()
    }
    for value, row in plan.items():
        before, after = compact_partition(spark, path, "dt", value, target_bytes)
        assert before == row["files_before"]
        if row["action"] == "compact":
            assert after == row["target_files"] < before
        else:
            assert after == before  # short-circuited, nothing rewritten

    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        compaction_plan(spark, path, "dt")
    with pytest.raises(ValueError, match="exactly one"):
        compaction_plan(spark, path, "dt", target_file_bytes=1, rows_per_file=1)
