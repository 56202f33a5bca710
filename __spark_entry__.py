"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (ticks → 1-minute OHLC, SURVEY.md
§7.2) at sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with DuckDB twins for the correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trading_etl_spark.registry import build_oracles, build_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # sf0.001 is tiny — 200 default shuffle partitions would be task overhead
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    from trading_etl_spark.queries.trading import q_ohlc_1m

    return q_ohlc_1m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query (same column names)."""
    return build_oracles()
