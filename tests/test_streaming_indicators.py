"""Stateful streaming EMA (applyInPandasWithState): TA-Lib seeding semantics
and state continuation across separate micro-batch runs (checkpoint restore)."""

import json

import numpy as np
import pytest

from trading_etl_spark.operators.indicators import _ema_series, _rsi_series
from trading_etl_spark.streaming.indicators import stream_ema, stream_rsi
from trading_etl_spark.streaming.ticks import parse_ticks, read_tick_frames

PERIOD = 4


def _frame(i, bid):
    ts = f"2024-01-01T10:00:{i:02d}.000Z"
    return json.dumps(
        {"type": "ticker", "symbol": "USD_JPY", "timestamp": ts,
         "bid": str(bid), "ask": str(bid + 0.2)}
    )


PRICES = [100.0, 101.0, 103.0, 102.0, 105.0, 104.0, 106.0, 103.0]
MIDS = [p + 0.1 for p in PRICES]


def _run(spark, src, sink, ckpt):
    """Parquet sink: the memory sink cannot recover from a checkpoint, and
    checkpoint-restored state is exactly what this test exercises."""
    ticks = parse_ticks(read_tick_frames(spark, src))
    ema = stream_ema(ticks, period=PERIOD)
    q = (
        ema.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r["time"].second: r["ema"] for r in spark.read.parquet(sink).collect()}


def test_stream_ema_matches_batch_series_across_restarts(spark, tmp_path):
    src, sink, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()

    # batch 1: first 6 ticks (seed of 4 + 2 recursive steps)
    (tmp_path / "in" / "a.jsonl").write_text(
        "\n".join(_frame(i, p) for i, p in enumerate(PRICES[:6])) + "\n"
    )
    got1 = _run(spark, src, sink, ckpt)

    expected = _ema_series(np.array(MIDS), PERIOD)
    assert set(got1) == {3, 4, 5}  # warm-up rows 0-2 produce no output
    for i in got1:
        assert got1[i] == pytest.approx(expected[i], abs=1e-9)

    # batch 2: two more ticks — state must continue from the checkpoint,
    # not re-seed; values must equal the batch EMA over the full series
    (tmp_path / "in" / "b.jsonl").write_text(
        "\n".join(_frame(i + 6, p) for i, p in enumerate(PRICES[6:])) + "\n"
    )
    got2 = _run(spark, src, sink, ckpt)
    assert set(got2) == {3, 4, 5, 6, 7}
    for i in got2:
        assert got2[i] == pytest.approx(expected[i], abs=1e-9)


def test_stream_rsi_matches_batch_series_across_restarts(spark, tmp_path):
    src, sink, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()

    def run():
        ticks = parse_ticks(read_tick_frames(spark, src))
        q = (
            stream_rsi(ticks, period=PERIOD)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["time"].second: r["rsi"] for r in spark.read.parquet(sink).collect()}

    (tmp_path / "in" / "a.jsonl").write_text(
        "\n".join(_frame(i, p) for i, p in enumerate(PRICES[:6])) + "\n"
    )
    got1 = run()

    expected = _rsi_series(np.array(MIDS), PERIOD)
    # first RSI value appears at index `period` (after `period` diffs)
    assert set(got1) == {4, 5}
    for i in got1:
        assert got1[i] == pytest.approx(expected[i], abs=1e-9)

    # Wilder state must continue from the checkpoint, not re-seed
    (tmp_path / "in" / "b.jsonl").write_text(
        "\n".join(_frame(i + 6, p) for i, p in enumerate(PRICES[6:])) + "\n"
    )
    got2 = run()
    assert set(got2) == {4, 5, 6, 7}
    for i in got2:
        assert got2[i] == pytest.approx(expected[i], abs=1e-9)
