"""TA-Lib golden vectors (FIXTURES.md §8) for SMA/EMA/RSI.

Input closes [1..6], period 3:
- SMA: [NULL, NULL, 2, 3, 4, 5]
- EMA (seed=SMA(first 3)=2, k=2/4): [NULL, NULL, 2, 3, 4, 5]
- RSI (all gains): [NULL, NULL, NULL, 100, 100, 100]
"""

import math
from datetime import datetime, timedelta

import numpy as np
import pytest

from trading_etl_spark.operators.indicators import (
    _ema_series,
    _rsi_series,
    ema,
    rsi,
    sma,
)
from trading_etl_spark.schemas import OHLC_SCHEMA


def _ohlc(spark, closes, pair="USD/JPY"):
    t0 = datetime(2024, 1, 1)
    rows = [
        (pair, "1h", t0 + timedelta(hours=i), c, c, c, c)
        for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, OHLC_SCHEMA)


def _values(df):
    rows = sorted(df.collect(), key=lambda r: r["time"])
    return [r["value"] for r in rows]


def test_sma_golden_vector(spark):
    vals = _values(sma(_ohlc(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]), 3))
    assert vals[:2] == [None, None]
    assert vals[2:] == [2.0, 3.0, 4.0, 5.0]


def test_ema_golden_vector(spark):
    vals = _values(ema(_ohlc(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]), 3))
    assert vals[:2] == [None, None]
    assert vals[2:] == pytest.approx([2.0, 3.0, 4.0, 5.0])


def test_rsi_golden_vector_all_gains(spark):
    vals = _values(rsi(_ohlc(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]), 3))
    assert vals[:3] == [None, None, None]
    assert vals[3:] == pytest.approx([100.0, 100.0, 100.0])


def test_rsi_flat_series_is_zero():
    # TA-Lib guard: avgGain + avgLoss == 0 → 0
    out = _rsi_series(np.array([5.0] * 6), 3)
    assert np.isnan(out[:3]).all()
    assert (out[3:] == 0.0).all()


def test_rsi_mixed_wilder_smoothing():
    closes = np.array([10.0, 11.0, 10.5, 11.5, 12.0, 11.0])
    out = _rsi_series(closes, 3)
    # seed: gains [1, 0, 1], losses [0, .5, 0] → ag=2/3, al=1/6 → 80
    assert math.isclose(out[3], 100 * (2 / 3) / (2 / 3 + 1 / 6))
    # next: ag=(2/3*2+0.5)/3, al=(1/6*2)/3
    ag, al = (2 / 3 * 2 + 0.5) / 3, (1 / 6 * 2) / 3
    assert math.isclose(out[4], 100 * ag / (ag + al))


def test_ema_short_group_all_null():
    out = _ema_series(np.array([1.0, 2.0]), 3)
    assert np.isnan(out).all()


def test_groups_are_independent(spark):
    df = _ohlc(spark, [1.0, 2.0, 3.0, 4.0], "USD/JPY").unionByName(
        _ohlc(spark, [10.0, 20.0, 30.0, 40.0], "EUR/JPY")
    )
    out = ema(df, 3)
    usd = _values(out.filter(out.currency_pair_code == "USD/JPY"))
    eur = _values(out.filter(out.currency_pair_code == "EUR/JPY"))
    assert usd[2:] == pytest.approx([2.0, 3.0])
    assert eur[2:] == pytest.approx([20.0, 30.0])
