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
