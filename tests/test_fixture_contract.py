"""Fixture-contract tests: validate the parquet *adapter* against the real
driver corpus at /root/testdata, not synthetic DataFrames.

Round 2 postmortem: every operator was pytest-green on synthetic inputs while
the parquet loader silently collapsed timestamps 1000x because the fixture's
``ts`` encoding drifted between rounds (INT64-nanos -> TIMESTAMP(MICROS)).
These tests make environment drift fail loudly.
"""

from __future__ import annotations

import os

import pytest

from trading_etl_spark.sources.ticks import load_events, load_ticks

SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/events.parquet"),
    reason="driver testdata corpus not present",
)


def test_events_ts_spans_days_and_lands_in_range(spark):
    """The events fixture covers ~30 days of 2024 data; a unit-drift bug
    compresses it to minutes near the 1970 epoch (the r2 failure mode)."""
    from pyspark.sql import functions as F

    row = load_events(spark, SF_DIR).agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).first()
    span = row["hi"] - row["lo"]
    assert span.days >= 1, f"ts span {span} < 1 day: unit drift in the loader"
    assert 2020 <= row["lo"].year <= 2100, f"ts epoch wrong: min={row['lo']}"


def test_tick_dedup_count_matches_duckdb(spark):
    """load_ticks row count == DuckDB-computed distinct (pair, second) count
    over the same parquet — an engine-independent oracle on the adapter."""
    import duckdb

    n_spark = load_ticks(spark, SF_DIR).count()
    n_oracle = duckdb.sql(
        f"""
        SELECT count(DISTINCT (CAST(user_id % 6 AS INTEGER) + 1,
                               date_trunc('second', ts)))
        FROM read_parquet('{SF_DIR}/events.parquet')
        WHERE value > 0
        """
    ).fetchone()[0]
    assert n_spark == n_oracle


def test_stream_events_schema_matches_footer(spark):
    """The streaming twin must branch on the parquet footer exactly like the
    batch loader: ts arrives as a proper TimestampType, never a collapsed
    epoch-long."""
    from pyspark.sql import types as T

    from trading_etl_spark.sources.ticks import stream_events

    st = stream_events(spark, SF_DIR)
    assert isinstance(st.schema["ts"].dataType, T.TimestampType)
    assert st.isStreaming
