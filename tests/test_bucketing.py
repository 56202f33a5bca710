"""Bucketed catalog tables: identically-bucketed relations must join with no
shuffle exchange (the pay-once layout for repeatedly-joined facts)."""

import pytest

from pyspark.sql import functions as F

from trading_etl_spark.io import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    write_bucketed(left, "t_bucket_left", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "t_bucket_right", ["k"], n_buckets=8, sort_cols=["k"])
    try:
        joined = spark.table("t_bucket_left").join(
            spark.table("t_bucket_right"), "k", "inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 10_000
        got = joined.filter(F.col("k") == 7).first()
        assert (got["a"], got["b"]) == (14, 21)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")


def test_bucketed_fact_sma_golden_cross_no_exchange(spark, no_broadcast):
    """VERDICT r3 task #9 — the REAL signal query over a bucketed fact:
    persist fact_sma bucketed on the window/join prefix (pair, timeframe,
    calc_version); the period-14/period-28 self-join AND the LAG window must
    then run with ZERO shuffle exchanges — the pay-once layout that makes
    the repeatedly-run signal scan shuffle-free at 100 TB."""
    from datetime import datetime, timedelta

    from trading_etl_spark.operators.signals import golden_cross

    t0 = datetime(2024, 1, 1)
    rows = []
    for pair in ("USD/JPY", "EUR/JPY"):
        # short SMA crosses above long between t1 and t2 → one BUY at t2
        for i, (s, lo) in enumerate([(1.0, 2.0), (1.5, 2.0), (3.0, 2.0), (3.5, 2.0)]):
            rows.append((pair, "1h", "v1", t0 + timedelta(hours=i), 14, s))
            rows.append((pair, "1h", "v1", t0 + timedelta(hours=i), 28, lo))
    fact_sma = spark.createDataFrame(
        rows,
        "currency_pair_code string, timeframe_code string, calc_version string,"
        " time timestamp, period int, value double",
    )
    expected = sorted(
        (r["currency_pair_code"], r["event_datetime"])
        for r in golden_cross(fact_sma).collect()
    )
    assert len(expected) == 2  # one BUY per pair — the fixture crosses once

    write_bucketed(
        fact_sma,
        "t_fact_sma_bucketed",
        ["currency_pair_code", "timeframe_code", "calc_version"],
        n_buckets=4,
        sort_cols=["time"],
    )
    old_subset = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    # session.get_spark sets this false; pin it here so the test holds under
    # a vanilla session too — subset co-partitioning is what lets the 3-col
    # bucketing serve the 4-key join shuffle-free
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try:
        events = golden_cross(spark.table("t_fact_sma_bucketed"))
        plan = events._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # no shuffle, no broadcast: bucket-local
        got = sorted(
            (r["currency_pair_code"], r["event_datetime"]) for r in events.collect()
        )
        assert got == expected
    finally:
        spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", old_subset)
        spark.sql("DROP TABLE IF EXISTS t_fact_sma_bucketed")


def test_bucketed_agg_skips_shuffle(spark, no_broadcast):
    df = spark.range(5_000).select((F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "t_bucket_agg", ["k"], n_buckets=4)
    try:
        agg = spark.table("t_bucket_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert agg.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucket_agg")
