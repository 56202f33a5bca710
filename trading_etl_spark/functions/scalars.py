"""Scalar expression library (SURVEY.md §2.2 P6-P8, A2 bucketing).

The reference computes these inline — mid price in the relay
(``src/gmo/ws_ticker_server.py:164``), UTC normalization + ISO-8601 ``Z``
formatting (``:57-63,168``), second truncation (``src/gmo/ws-connection.py:
56-57``), epoch-floor bucketing (``src/etl/flows/transform_services.py:
108-110``). Centralized here as composable Column expressions — all JVM-side
built-ins, whole-stage-codegen friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mid_price(bid: str | Column = "bid", ask: str | Column = "ask") -> Column:
    """P6: mid = (bid + ask) / 2."""
    bid = F.col(bid) if isinstance(bid, str) else bid
    ask = F.col(ask) if isinstance(ask, str) else ask
    return (bid + ask) / 2


def utc_second(ts: str | Column = "ts") -> Column:
    """P7+P8: truncate a (UTC-session) timestamp to the second."""
    return F.date_trunc("second", ts)


def epoch_bucket(time: str | Column, duration_seconds: str | Column) -> Column:
    """A2: epoch-floor tumbling bucket — to_timestamp(floor(epoch/dur)*dur).

    Matches both the reference's formula (transform_services.py:108-110) and
    Spark's window() start for the same duration (epoch-aligned).
    """
    dur = (
        F.col(duration_seconds)
        if isinstance(duration_seconds, str)
        else duration_seconds
    )
    return F.timestamp_seconds(F.floor(F.unix_timestamp(time) / dur) * dur)


def iso8601_utc(ts: str | Column = "time") -> Column:
    """ISO-8601 with trailing Z, as the relay emits (ws_ticker_server.py:168)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
