"""Aggregates every domain's (queries, oracles) pairs for __spark_entry__.py.

Every operator claimed in SURVEY.md §2 has a ``queries()`` entry here; each
SQL-expressible one has a DuckDB ``oracle_sql()`` twin. Keys are stable —
the driver records per-key correctness in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .queries import analytics, datapipe, streamgate, trading

_DOMAINS = [trading, datapipe, analytics, streamgate]


def _pin_utc(fn: Callable[[SparkSession, str], DataFrame]):
    """Timestamps must be session-TZ-independent to hash-match the (naive,
    UTC) DuckDB oracle — pin UTC regardless of the caller's session config."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__doc__ = fn.__doc__
    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _DOMAINS:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query keys: {overlap}")
        out.update({k: _pin_utc(v) for k, v in mod.QUERIES.items()})
    return out


def build_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _DOMAINS:
        out.update(getattr(mod, "ORACLES", {}))
    return out
