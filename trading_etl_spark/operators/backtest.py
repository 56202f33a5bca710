"""Backtest engine: event-ordered replay of buy/sell signals computing PnL.

The reference ships only a stub (``src/core/backtest_engine.py:5-44``;
requirements ``docs/requirements.md:13-19``). Realized here as ordered window
functions over fact_buysell_events: for each SELL whose immediately preceding
event (per pair, timeframe, period, by time) is a BUY, realized PnL is
``sell price − buy price`` with a fixed quantity of 1 unit.

Scale notes: one window shuffle on (pair, timeframe, period); no driver-side
replay loop — the reference's stubbed design would iterate events in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def backtest_pnl(events: DataFrame) -> DataFrame:
    """Per (pair, timeframe, period): number of closed trades + realized PnL."""
    w = Window.partitionBy(
        "currency_pair_code", "trigger_indicator_timeframe", "trigger_indicator_period"
    ).orderBy("event_datetime")
    trades = (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_price", F.lag("price").over(w))
        .filter((F.col("event_type") == "SELL") & (F.col("prev_type") == "BUY"))
        .withColumn("pnl", F.col("price") - F.col("prev_price"))
    )
    return (
        trades.groupBy(
            "currency_pair_code",
            F.col("trigger_indicator_timeframe").alias("timeframe_code"),
            F.col("trigger_indicator_period").alias("period"),
        )
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.round(F.sum("pnl"), 6).alias("total_pnl"),
        )
    )
