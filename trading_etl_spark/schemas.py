"""Fixed StructType schemas mirroring the reference's SQL DDL (SURVEY.md §1.2).

Reference DDL: ticker tables ``src/etl/flows/transform_services.py:19-25``,
OHLC tables ``:41-49``, dims + fact tables
``alembic/versions/e2444ebd2a06_baseline_current_schema.py:39-120``.

The reference shards by (pair, timeframe) into separate tables; we collapse the
shards into ``currency_pair_code`` / ``timeframe_code`` columns — the idiomatic
Spark model and the design the reference's own docs aspire to
(``docs/design_v2.md:118-121``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw tick: reference ticker_{pair} tables, transform_services.py:19-25,
# plus the pair code column replacing the per-pair table name.
TICK_SCHEMA = T.StructType(
    [
        T.StructField("currency_pair_code", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("bid", T.DoubleType(), False),
        T.StructField("ask", T.DoubleType(), False),
    ]
)

# OHLC candle: transform_services.py:41-49 (+ pair/timeframe columns).
OHLC_SCHEMA = T.StructType(
    [
        T.StructField("currency_pair_code", T.StringType(), False),
        T.StructField("timeframe_code", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("open", T.DoubleType(), True),
        T.StructField("high", T.DoubleType(), True),
        T.StructField("low", T.DoubleType(), True),
        T.StructField("close", T.DoubleType(), True),
    ]
)

# Indicator fact: fact_sma/fact_ema/fact_rsi share one shape,
# e2444ebd2a06_baseline_current_schema.py:81-120.
INDICATOR_SCHEMA = T.StructType(
    [
        T.StructField("currency_pair_code", T.StringType(), False),
        T.StructField("timeframe_code", T.StringType(), False),
        T.StructField("period", T.IntegerType(), False),
        T.StructField("calc_version", T.StringType(), False),
        T.StructField("time", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),  # NaN during TA-Lib warm-up
    ]
)

# Buy/sell signal events: e2444ebd2a06_baseline_current_schema.py:64-78.
# trigger_indicator_timeframe carries timeframe_code (the declared semantics;
# the reference buggily writes the int id — SURVEY.md §3.3).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_datetime", T.TimestampType(), False),
        T.StructField("currency_pair_code", T.StringType(), False),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("quantity", T.IntegerType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("trigger_indicator_name", T.StringType(), False),
        T.StructField("trigger_indicator_value", T.DoubleType(), True),
        T.StructField("trigger_indicator_timeframe", T.StringType(), False),
        T.StructField("trigger_indicator_period", T.IntegerType(), False),
    ]
)

# Websocket tick message (docs/ws_ticker_spec.md:28-51; parse
# src/gmo/ws-connection.py:143-150). Used by from_json in streaming parse.
TICK_MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType(), True),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("bid", T.StringType(), True),  # feed sends numeric strings
        T.StructField("ask", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
    ]
)

# Dimensions: e2444ebd2a06_baseline_current_schema.py:39-61.
DIM_CURRENCY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("base_currency", T.StringType(), False),
        T.StructField("quote_currency", T.StringType(), False),
        T.StructField("currency_pair_code", T.StringType(), False),
        T.StructField("currency_pair_symbol", T.StringType(), False),
    ]
)

DIM_TIMEFRAME_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("timeframe_code", T.StringType(), False),
        T.StructField("timeframe_name", T.StringType(), False),
        T.StructField("duration_seconds", T.IntegerType(), False),
    ]
)

# Multimodal: opaque binary payload + typed metadata (north-star extension;
# no reference analog — the container has no image/audio codecs, so decode is
# stubbed while the Spark-side plumbing stays real).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)
