"""Salted skew utilities must be exactly equivalent to their unsalted plans,
including under a pathological hot key."""

from pyspark.sql import functions as F

from trading_etl_spark.operators.skew import salted_count_distinct, salted_join


def _skewed(spark):
    """1000 rows for one hot key, a handful for others."""
    hot = spark.range(1000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).alias("v"), F.col("id").alias("row_id")
    )
    cold = spark.range(5).select(
        F.concat(F.lit("c"), F.col("id")).alias("k"),
        F.col("id").alias("v"),
        (F.col("id") + 10_000).alias("row_id"),
    )
    return hot.unionByName(cold)


def test_salted_count_distinct_exact(spark):
    df = _skewed(spark)
    got = {
        r["k"]: r["n_distinct"]
        for r in salted_count_distinct(df, ["k"], "v", n_salts=7).collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want
    assert got["HOT"] == 97


def test_salted_join_equivalent(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", "hot-dim"), ("c1", "c1-dim"), ("c3", "c3-dim")], "k string, attr string"
    )
    got = salted_join(big, small, ["k"], salt_from="row_id", n_salts=5)
    plain = big.join(small, ["k"], "inner")
    assert got.count() == plain.count() == 1002
    assert sorted(got.columns) == sorted(plain.columns)
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("HOT", "d")], "k string, attr string")
    got = salted_join(big, small, ["k"], salt_from="row_id", n_salts=3, how="left")
    assert got.count() == 1005
    assert got.filter(F.col("attr").isNull()).count() == 5
