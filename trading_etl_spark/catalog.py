"""SQL catalog surface: every raw table and curated relation as a view.

The reference's users live in SQL (psql over the Postgres warehouse;
``docs/dimensional_modeling.md`` is written in table terms). This module
makes the Spark engine queryable the same way: after ``register_views``,
``spark.sql("SELECT ... FROM ohlc_1m JOIN dim_currency ...")`` works with
no Python API knowledge — Catalyst sees straight through a view, so SQL
over these views optimizes identically to the DataFrame queries
(predicate pushdown into the parquet scans, broadcast dims, the shared
candle-chain cache).

Views registered:
- raw driver tables: region nation customer supplier part orders lineitem
  events documents embeddings
- curated: dim_currency, dim_timeframe, ticks (validated + deduped),
  ohlc_1m, ohlc_all_tf (derived timeframes unioned with the 1m base),
  ohlc_1h, fact_sma_1h (the reference's materialized indicator tables as
  single pair/timeframe-column views)
"""

from __future__ import annotations

from pyspark.sql import SparkSession

RAW_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register raw + curated relations as temp views; returns the names."""
    from .queries import trading
    from .sources import dims, ticks

    names: list[str] = []
    for t in RAW_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        names.append(t)

    dims.dim_currency(spark).createOrReplaceTempView("dim_currency")
    dims.dim_timeframe(spark).createOrReplaceTempView("dim_timeframe")
    names += ["dim_currency", "dim_timeframe"]

    ticks.load_ticks(spark, sf_dir).createOrReplaceTempView("ticks")
    names.append("ticks")

    base, derived = trading.candle_chain(spark, sf_dir)
    base.createOrReplaceTempView("ohlc_1m")
    base.unionByName(derived).createOrReplaceTempView("ohlc_all_tf")
    names += ["ohlc_1m", "ohlc_all_tf"]

    # the reference's materialized indicator tables (fact_sma_usd_jpy_1h
    # etc., transform_services.py) — here ONE view each, pair/timeframe as
    # columns, backed by the same cached relations the queries consume
    trading._ohlc_1h(spark, sf_dir).createOrReplaceTempView("ohlc_1h")
    trading._fact_sma_1h(spark, sf_dir, [14, 28]).createOrReplaceTempView(
        "fact_sma_1h"
    )
    names += ["ohlc_1h", "fact_sma_1h"]
    return names
