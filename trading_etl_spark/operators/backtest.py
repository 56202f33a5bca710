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


def backtest_trades(events: DataFrame) -> DataFrame:
    """Per-trade listing: each SELL whose immediately preceding event is a
    BUY closes one round trip (buy/sell time + prices + realized PnL)."""
    w = Window.partitionBy(
        "currency_pair_code", "trigger_indicator_timeframe", "trigger_indicator_period"
    ).orderBy("event_datetime")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_price", F.lag("price").over(w))
        .withColumn("prev_time", F.lag("event_datetime").over(w))
        .filter((F.col("event_type") == "SELL") & (F.col("prev_type") == "BUY"))
        .select(
            "currency_pair_code",
            F.col("trigger_indicator_timeframe").alias("timeframe_code"),
            F.col("trigger_indicator_period").alias("period"),
            F.col("prev_time").alias("buy_time"),
            F.col("event_datetime").alias("sell_time"),
            F.col("prev_price").alias("buy_price"),
            F.col("price").alias("sell_price"),
            F.round(F.col("price") - F.col("prev_price"), 6).alias("pnl"),
        )
    )


def equity_curve(events: DataFrame) -> DataFrame:
    """Running cumulative PnL per (pair, timeframe, period), ordered by trade
    close time — the equity curve a backtest UI plots (running-total window
    over the trade stream)."""
    w = (
        Window.partitionBy("currency_pair_code", "timeframe_code", "period")
        .orderBy("sell_time")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    trades = backtest_trades(events)
    return trades.select(
        "currency_pair_code",
        "timeframe_code",
        "period",
        "sell_time",
        "pnl",
        F.round(F.sum("pnl").over(w), 6).alias("cum_pnl"),
    )


def max_drawdown(events: DataFrame) -> DataFrame:
    """Peak cumulative PnL and maximum drawdown per (pair, timeframe,
    period) — THE risk statistic a backtest report leads with. Drawdown at
    time t is ``running-peak(cum_pnl) − cum_pnl`` (absolute PnL terms —
    the ratio form divides by a peak that can be ≤ 0 for losing
    strategies); max over the curve is the answer. The running-max window
    shares the equity curve's (keys, sell_time) partitioning/order, so no
    extra exchange; the final agg collapses to one row per strategy."""
    keys = ["currency_pair_code", "timeframe_code", "period"]
    w = (
        Window.partitionBy(*keys)
        .orderBy("sell_time")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = equity_curve(events)
    dd = F.round(F.max("cum_pnl").over(w) - F.col("cum_pnl"), 6)
    return (
        curve.withColumn("_dd", dd)
        .groupBy(*keys)
        .agg(
            F.round(F.max("cum_pnl"), 6).alias("peak_cum_pnl"),
            F.max("_dd").alias("max_drawdown"),
        )
    )


def backtest_pnl(events: DataFrame) -> DataFrame:
    """Per (pair, timeframe, period): number of closed trades + realized
    PnL. The PnL sum is exact decimal (r13): per-trade price diffs sit on
    the 1e-2 tick grid, so DECIMAL(27,6) recovers and sums them exactly —
    order- and engine-independent (the _msum convention; see PLANS.md
    float-reduction ledger)."""
    return (
        backtest_trades(events)
        .groupBy("currency_pair_code", "timeframe_code", "period")
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.sum((F.col("sell_price") - F.col("buy_price")).cast("decimal(27,6)"))
            .cast("double")
            .alias("total_pnl"),
        )
    )
