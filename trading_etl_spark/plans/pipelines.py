"""Batch ETL pipelines — the reference's Prefect flows as DataFrame lineage
(SURVEY.md §3.2/§3.3).

Reference orchestration (``src/etl/flows/transform.py``):
- ``ohlc_pipeline``      :23-76  — create OHLC tables, base 1m agg per pair,
                                   derived timeframes per pair×tf (wait_for DAG)
- indicator flow         :79-121 — SMA/EMA/RSI per tf×period (task fan-out)
- strategy flow          :123-129 — golden/dead cross inserts

Here each flow is a function: the Prefect ``wait_for`` DAG becomes plain
DataFrame dependency, per-pair task fan-out becomes partition parallelism,
and every write is the W1 first-wins idempotent append (io.first_wins_append)
— re-running any pipeline adds zero rows, the reference's ON CONFLICT
DO NOTHING contract.

Warehouse layout (parquet, UTC):
- ``{wh}/ohlc``                 partitioned by timeframe_code, currency_pair_code
- ``{wh}/fact_{sma,ema,rsi}``   partitioned by timeframe_code
- ``{wh}/fact_buysell_events``

Scale notes: partition columns mirror the reference's table-per-(pair, tf)
sharding (SURVEY.md §1.1) so per-(pair, tf) reads prune to one directory;
appends prune the anti-join's existing side by the incoming time range
(io.py). Dims are 6-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

import os

from pyspark.sql import functions as F

from ..config import DEFAULT_INDICATOR_PERIODS
from ..io import first_wins_append
from ..operators import indicators, ohlc, signals
from ..sources import dims, ticks

OHLC_KEYS = ["currency_pair_code", "timeframe_code", "time"]
IND_KEYS = ["currency_pair_code", "timeframe_code", "period", "calc_version", "time"]
# reference PK: (event_datetime, currency_id, event_type, trigger_indicator_name)
# e2444ebd2a06:76 — plus the timeframe/period scoping we fix per SURVEY §3.3
EVENT_KEYS = [
    "event_datetime",
    "currency_pair_code",
    "event_type",
    "trigger_indicator_name",
    "trigger_indicator_timeframe",
    "trigger_indicator_period",
]


def ohlc_pipeline(spark: SparkSession, sf_dir: str, warehouse: str) -> dict[str, int]:
    """Ticks → 1m candles → derived timeframes, idempotently appended.

    Mirrors transform.py:23-76: derived aggregation reads the *written* 1m
    relation (the reference's base→derived wait_for edge), so incremental
    runs re-derive only from the materialized base table.
    """
    path = f"{warehouse}/ohlc"
    base = ohlc.ohlc_base(ticks.load_ticks(spark, sf_dir))
    n_base = first_wins_append(
        spark, path, base, OHLC_KEYS,
        partition_by=["timeframe_code", "currency_pair_code"],
    )
    written_1m = spark.read.parquet(path).filter("timeframe_code = '1m'")
    derived = ohlc.ohlc_derived(written_1m, dims.dim_timeframe(spark)).select(
        *ohlc.OHLC_COLS
    )
    n_derived = first_wins_append(
        spark, path, derived, OHLC_KEYS,
        partition_by=["timeframe_code", "currency_pair_code"],
    )
    return {"ohlc_base_rows": n_base, "ohlc_derived_rows": n_derived}


LOOKBACK_PERIODS = 4  # warm-up window = 4×period buckets (reference uses 2×:
# transform_services.py:161-175; doubled because EMA's exponential tail is
# still ~6e-4 of full weight at 2×period — W1 keeps old rows either way)


def _candles_after_cursor(
    candles: DataFrame, fact: DataFrame, period: int
) -> DataFrame:
    """W2: prune the candle input to each group's new rows plus a
    ``LOOKBACK_PERIODS × period``-ROW warm-up before the MAX(time) cursor —
    row-based like the reference (``OFFSET 2×period ROWS``,
    transform_services.py:161-175), because candle streams have gaps and a
    time-based lookback can under-fill the warm-up window.

    new-row count per group is a windowed conditional sum; keep rank ≤
    new_count + lookback_rows ranked by time desc. Groups with no cursor
    (first run) keep full history. At 100 TB a generous coarse time filter
    (partition pruning) precedes this ranking pass.
    """
    cursors = (
        fact.filter(F.col("period") == period)
        .groupBy("currency_pair_code", "timeframe_code")
        .agg(F.max("time").alias("_max_time"))
    )
    grp = Window.partitionBy("currency_pair_code", "timeframe_code")
    rank_desc = F.row_number().over(grp.orderBy(F.desc("time")))
    n_new = F.sum(
        F.when(F.col("time") > F.col("_max_time"), 1).otherwise(0)
    ).over(grp)
    return (
        candles.join(
            F.broadcast(cursors), ["currency_pair_code", "timeframe_code"], "left"
        )
        .withColumn("_rank", rank_desc)
        .withColumn("_n_new", n_new)
        .filter(
            F.col("_max_time").isNull()
            | (F.col("_rank") <= F.col("_n_new") + LOOKBACK_PERIODS * period)
        )
        .drop("_max_time", "_rank", "_n_new")
    )


def indicator_pipeline(
    spark: SparkSession,
    warehouse: str,
    periods: list[int] | None = None,
    calc_version: str = "0",
    incremental: bool = True,
) -> dict[str, int]:
    """SMA/EMA/RSI facts over every (pair, timeframe, period) in one set-based
    pass each (transform.py:79-121 without the nested Python loops).

    With ``incremental`` and an existing fact table, each (pair, tf, period)
    group recomputes only from its W2 cursor-minus-lookback onward; the W1
    first-wins append drops the overlap — the reference's exact incremental
    contract (recomputed warm-up rows never overwrite history).
    """
    periods = periods or DEFAULT_INDICATOR_PERIODS
    candles = spark.read.parquet(f"{warehouse}/ohlc")
    out: dict[str, int] = {}
    for name, fn in (("sma", indicators.sma), ("ema", indicators.ema), ("rsi", indicators.rsi)):
        path = f"{warehouse}/fact_{name}"
        fact = spark.read.parquet(path) if os.path.exists(path) else None
        parts = []
        for p in periods:
            cand_p = (
                _candles_after_cursor(candles, fact, p)
                if (incremental and fact is not None)
                else candles
            )
            parts.append(fn(cand_p, p, calc_version))
        df = parts[0]
        for part in parts[1:]:
            df = df.unionByName(part)
        out[f"fact_{name}_rows"] = first_wins_append(
            spark, path, df, IND_KEYS, partition_by=["timeframe_code"]
        )
    return out


def strategy_pipeline(
    spark: SparkSession,
    warehouse: str,
    short_period: int = 14,
    long_period: int = 28,
) -> dict[str, int]:
    """Golden/dead-cross events from the written fact_sma relation
    (transform.py:123-129), scoped per timeframe (the declared semantics)."""
    fact_sma = spark.read.parquet(f"{warehouse}/fact_sma")
    events = signals.buysell_events(fact_sma, short_period, long_period)
    n = first_wins_append(
        spark, f"{warehouse}/fact_buysell_events", events, EVENT_KEYS,
        prune_on="event_datetime",
    )
    return {"fact_buysell_events_rows": n}


def run_etl(spark: SparkSession, sf_dir: str, warehouse: str) -> dict[str, int]:
    """The full flow chain: OHLC → indicators → strategy (transform.py:23-26
    orchestration collapsed into one lineage-ordered run)."""
    stats = ohlc_pipeline(spark, sf_dir, warehouse)
    stats |= indicator_pipeline(spark, warehouse)
    stats |= strategy_pipeline(spark, warehouse)
    return stats
