"""Custom stateful streaming operator: incremental EMA per symbol via
``applyInPandasWithState`` (SURVEY.md §2.9 — the streaming twin of the
batch grouped-UDF indicators).

The batch engine recomputes EMA over the whole series per run (the
reference's incremental path re-reads a 2×period lookback window,
``src/etl/flows/transform_services.py:161-175``). Streaming needs neither:
the Wilder/TA-Lib recursion is a one-value state machine, so per-symbol
state is just (seed-count, seed-sum, current EMA) — O(1) per symbol, carried
across micro-batches AND restarts by the state store/checkpoint.

Semantics (TA-Lib EMA, matching operators/indicators._ema_series):
- first ``period`` observations accumulate into an SMA seed (no output);
- from the seed row on, ``ema += k·(x − ema)`` with ``k = 2/(period+1)``,
  one output row per observation.

Ordering: rows are processed in event-time order *within* each micro-batch;
cross-batch order is arrival order — the standard contract for incremental
streaming indicators (a late tick inside the watermark reorders only its own
batch). Scale notes: state is a few doubles per symbol; the stateful
exchange hash-partitions on symbol, the same key the dedup upstream already
partitioned on.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EMA_OUT_SCHEMA = StructType(
    [
        StructField("currency_pair_symbol", StringType()),
        StructField("time", TimestampType()),
        StructField("price", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", IntegerType()),
        StructField("seed_sum", DoubleType()),
        StructField("ema", DoubleType()),
    ]
)


RSI_OUT_SCHEMA = StructType(
    [
        StructField("currency_pair_symbol", StringType()),
        StructField("time", TimestampType()),
        StructField("price", DoubleType()),
        StructField("rsi", DoubleType()),
    ]
)

RSI_STATE_SCHEMA = StructType(
    [
        StructField("prev_price", DoubleType()),
        StructField("n_diffs", IntegerType()),
        StructField("gain_sum", DoubleType()),
        StructField("loss_sum", DoubleType()),
        StructField("avg_gain", DoubleType()),
        StructField("avg_loss", DoubleType()),
    ]
)


def stream_rsi(ticks: DataFrame, period: int = 14, price_col: str = "mid") -> DataFrame:
    """Per-symbol incremental RSI (Wilder smoothing, matching
    operators/indicators._rsi_series): the recursion is a two-accumulator
    state machine — (avg_gain, avg_loss) plus the previous price — so state
    stays O(1) per symbol across micro-batches and restarts.

    Warm-up: the first ``period`` price diffs accumulate into the seed means
    (no output); the seed row emits 100·g/(g+l); every later diff applies
    ``avg = (avg·(period−1) + x)/period`` and emits.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            prev, n_diffs, gain_sum, loss_sum, avg_gain, avg_loss = state.get
        else:
            prev, n_diffs, gain_sum, loss_sum = None, 0, 0.0, 0.0
            avg_gain = avg_loss = float("nan")
        rows: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("time")
            for t, x in zip(pdf["time"], pdf[price_col]):
                x = float(x)
                if prev is None:
                    prev = x
                    continue
                diff = x - prev
                prev = x
                gain, loss = max(diff, 0.0), max(-diff, 0.0)
                if n_diffs < period:
                    n_diffs += 1
                    gain_sum += gain
                    loss_sum += loss
                    if n_diffs == period:
                        avg_gain = gain_sum / period
                        avg_loss = loss_sum / period
                    else:
                        continue
                else:
                    avg_gain = (avg_gain * (period - 1) + gain) / period
                    avg_loss = (avg_loss * (period - 1) + loss) / period
                denom = avg_gain + avg_loss
                rsi = 100.0 * avg_gain / denom if denom != 0.0 else 0.0
                rows.append((symbol, t, x, rsi))
        state.update((prev, n_diffs, gain_sum, loss_sum, avg_gain, avg_loss))
        if rows:
            yield pd.DataFrame(
                rows, columns=["currency_pair_symbol", "time", "price", "rsi"]
            )

    return ticks.groupBy("currency_pair_symbol").applyInPandasWithState(
        update,
        outputStructType=RSI_OUT_SCHEMA,
        stateStructType=RSI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_ema(ticks: DataFrame, period: int = 14, price_col: str = "mid") -> DataFrame:
    """Per-symbol incremental EMA over a streaming tick DataFrame.

    ``ticks`` must carry (currency_pair_symbol, time, <price_col>) — e.g. the
    output of streaming.ticks.dedup_ticks.
    """
    k = 2.0 / (period + 1.0)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        n_seen, seed_sum, ema = state.get if state.exists else (0, 0.0, float("nan"))
        rows: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("time")
            for t, x in zip(pdf["time"], pdf[price_col]):
                x = float(x)
                if n_seen < period:
                    n_seen += 1
                    seed_sum += x
                    if n_seen == period:
                        ema = seed_sum / period
                        rows.append((symbol, t, x, ema))
                else:
                    ema = ema + k * (x - ema)
                    rows.append((symbol, t, x, ema))
        state.update((n_seen, seed_sum, ema))
        if rows:
            yield pd.DataFrame(
                rows, columns=["currency_pair_symbol", "time", "price", "ema"]
            )

    return ticks.groupBy("currency_pair_symbol").applyInPandasWithState(
        update,
        outputStructType=EMA_OUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
