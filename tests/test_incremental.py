"""W2 incremental indicator recompute: after new candles arrive, only
cursor-forward rows are appended; SMA (finite window ≤ lookback) matches a
full recompute exactly; recursive indicators converge within the lookback."""

import pytest

from pyspark.sql import functions as F

from trading_etl_spark.io import first_wins_append
from trading_etl_spark.operators import indicators, ohlc
from trading_etl_spark.plans import pipelines
from trading_etl_spark.sources import dims, ticks

SF_DIR = "/root/testdata/sf0.001"
PERIODS = [3, 5]


def test_incremental_indicator_recompute(spark, tmp_path):
    wh = str(tmp_path / "wh")
    candles = ohlc.ohlc_base(ticks.load_ticks(spark, SF_DIR)).cache()
    t_max = candles.agg(F.max("time")).first()[0]
    cutoff = t_max - __import__("datetime").timedelta(hours=2)

    # initial state: history up to the cutoff, indicators computed in full
    first_wins_append(
        spark, f"{wh}/ohlc", candles.filter(F.col("time") <= cutoff),
        pipelines.OHLC_KEYS, partition_by=["timeframe_code", "currency_pair_code"],
    )
    stats1 = pipelines.indicator_pipeline(spark, wh, periods=PERIODS)
    assert stats1["fact_sma_rows"] > 0

    # new candles land; incremental run must append exactly the new times
    new = candles.filter(F.col("time") > cutoff)
    n_new = new.count()
    assert n_new > 0
    first_wins_append(
        spark, f"{wh}/ohlc", new, pipelines.OHLC_KEYS,
        partition_by=["timeframe_code", "currency_pair_code"],
    )
    stats2 = pipelines.indicator_pipeline(spark, wh, periods=PERIODS)
    assert stats2["fact_sma_rows"] == n_new * len(PERIODS)

    # SMA window (max 5) ≤ lookback (4×period) → incremental == full, exactly
    fact_sma = spark.read.parquet(f"{wh}/fact_sma")
    full = indicators.sma(candles, PERIODS[0]).unionByName(
        indicators.sma(candles, PERIODS[1])
    )
    got = {
        (r["currency_pair_code"], r["timeframe_code"], r["period"], r["time"]): r["value"]
        for r in fact_sma.collect()
    }
    want = {
        (r["currency_pair_code"], r["timeframe_code"], r["period"], r["time"]): r["value"]
        for r in full.collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        if v is None:
            assert got[k] is None
        else:
            assert got[k] == pytest.approx(v, abs=1e-9)

    # recursive EMA: appended tail rows converge to full recompute within
    # the exponential tail mass of the 4×period lookback
    fact_ema = spark.read.parquet(f"{wh}/fact_ema").filter(
        (F.col("time") > cutoff) & (F.col("period") == PERIODS[1])
    )
    full_ema = indicators.ema(candles, PERIODS[1]).filter(F.col("time") > cutoff)
    ge = {
        (r["currency_pair_code"], r["time"]): r["value"] for r in fact_ema.collect()
    }
    we = {
        (r["currency_pair_code"], r["time"]): r["value"] for r in full_ema.collect()
    }
    assert set(ge) == set(we)
    for k, v in we.items():
        if v is not None and ge[k] is not None:
            assert ge[k] == pytest.approx(v, rel=5e-2)

    # third run with nothing new: pure no-op
    stats3 = pipelines.indicator_pipeline(spark, wh, periods=PERIODS)
    assert all(v == 0 for v in stats3.values())
    candles.unpersist()
