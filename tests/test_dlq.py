"""Dead-letter routing: the validation gate must tag every rejected event
with exactly one reason and keep its full payload; valid rows must equal
the silent-drop tickify output exactly."""

from datetime import datetime

from pyspark.sql import functions as F

from trading_etl_spark.sources.ticks import tickify, tickify_with_dlq


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double,"
        " props string, event_type string"
    )


def test_dlq_reasons_and_valid_parity(spark):
    t = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 0, t, 100.0, '{"k": 3}', "view"),    # valid
        (2, 1, t, -5.0, '{"k": 1}', "view"),     # nonpositive bid
        (3, 2, t, None, '{"k": 1}', "view"),     # missing value
        (4, 3, t, 100.0, "not json", "view"),    # bad props → null spread
        (5, 4, t, 100.0, '{"k": 7}', "view"),    # valid
    ]
    ev = _events(spark, rows)
    ticks, dlq = tickify_with_dlq(ev)
    reasons = {r.event_id: r.dlq_reason for r in dlq.collect()}
    assert reasons == {
        2: "nonpositive_bid",
        3: "missing_value",
        4: "bad_props_spread",
    }
    # quarantined rows keep the full original payload
    bad = {r.event_id: r for r in dlq.collect()}
    assert bad[4].props == "not json" and bad[4].value == 100.0
    # the valid side is EXACTLY the silent-drop path
    got = sorted(tuple(r) for r in ticks.collect())
    want = sorted(tuple(r) for r in tickify(ev).collect())
    assert got == want and len(got) == 2


def test_dlq_empty_on_clean_feed(spark):
    t = datetime(2024, 1, 1, 12, 0, 0)
    ev = _events(
        spark, [(i, i, t, 100.0 + i, '{"k": 2}', "view") for i in range(6)]
    )
    ticks, dlq = tickify_with_dlq(ev)
    assert dlq.count() == 0
    assert ticks.count() == 6


def test_dlq_under_streaming_foreachbatch(spark, tmp_path):
    # the same split runs on a stream: foreachBatch writes BOTH sides from
    # one pass — quarantine keeps flowing while good ticks keep landing.
    import glob

    t = datetime(2024, 1, 1, 12, 0, 0)
    src = str(tmp_path / "src")
    _events(
        spark,
        [
            (1, 0, t, 100.0, '{"k": 3}', "view"),
            (2, 1, t, -5.0, '{"k": 1}', "view"),
            (3, 2, t, 101.0, '{"k": 2}', "view"),
        ],
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp, value double,"
        " props string, event_type string"
    ).parquet(src)
    good_dir, dlq_dir = str(tmp_path / "good"), str(tmp_path / "dlq")

    def route(batch_df, _bid):
        ticks, dlq = tickify_with_dlq(batch_df)
        ticks.write.mode("append").parquet(good_dir)
        dlq.write.mode("append").parquet(dlq_dir)

    q = (
        stream.writeStream.foreachBatch(route)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(good_dir).count() == 2
    bad = spark.read.parquet(dlq_dir).collect()
    assert len(bad) == 1 and bad[0].dlq_reason == "nonpositive_bid"
