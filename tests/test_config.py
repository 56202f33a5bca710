"""Config env-parsing parity with the reference
(tests/config/test_config.py:21-75 in /root/reference)."""

import pytest

from trading_etl_spark.config import EngineConfig


def test_defaults():
    cfg = EngineConfig.from_env({})
    assert cfg.timeframes["1m"] == 60
    assert cfg.timeframes["4h"] == 14400
    assert cfg.indicator_periods == [14, 28, 56]
    assert cfg.cross_short_period == 14
    assert cfg.cross_long_period == 28
    assert cfg.calc_version == "0"


def test_env_overrides():
    cfg = EngineConfig.from_env(
        {
            "ETL_INDICATOR_PERIODS": "7, 21",
            "ETL_CROSS_SHORT_PERIOD": "7",
            "ETL_CROSS_LONG_PERIOD": "21",
            "ETL_CALC_VERSION": "v2",
        }
    )
    assert cfg.indicator_periods == [7, 21]
    assert cfg.cross_short_period == 7
    assert cfg.cross_long_period == 21
    assert cfg.calc_version == "v2"


def test_bad_int_raises():
    with pytest.raises(ValueError):
        EngineConfig.from_env({"ETL_CROSS_SHORT_PERIOD": "seven"})


def test_bad_list_raises():
    with pytest.raises(ValueError):
        EngineConfig.from_env({"ETL_INDICATOR_PERIODS": "14,x,56"})
    with pytest.raises(ValueError):
        EngineConfig.from_env({"ETL_INDICATOR_PERIODS": " , "})


def test_timeframe_env_overrides():
    add = EngineConfig.from_env({"ETL_EXTRA_TIMEFRAMES": "2h:7200"})
    assert add.timeframes["2h"] == 7200
    assert add.timeframes["1m"] == 60  # seed kept
    full = EngineConfig.from_env({"ETL_TIMEFRAMES": "1m:60,1d:86400"})
    assert full.timeframes == {"1m": 60, "1d": 86400}


def test_bad_timeframes_raise():
    for raw in ["2h", "2h:xx", "2h:0", " , ", "2h:-60"]:
        with pytest.raises(ValueError):
            EngineConfig.from_env({"ETL_EXTRA_TIMEFRAMES": raw})


def test_session_scale_configs_pinned(spark):
    """The scale posture every plan in this repo assumes: AQE (runtime
    re-plan + skew-join splitting + partition coalescing), Arrow transfer
    for every pandas kernel, UTC, and subset co-partitioning for bucketed
    joins. A refactor that drops one of these silently invalidates the
    PLANS.md story — pin them."""
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert conf.get("spark.sql.session.timeZone") == "UTC"
    assert conf.get("spark.sql.requireAllClusterKeysForCoPartition") == "false"
