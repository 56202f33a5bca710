"""Streaming SMA cross detection must agree event-for-event with the batch
self-join + LAG path on identical input, including across a checkpoint
restart mid-stream."""

import json

import pytest

from pyspark.sql import functions as F

from trading_etl_spark.operators import indicators, signals
from trading_etl_spark.streaming.signals import stream_sma_cross

SHORT, LONG = 2, 3

# closes engineered to produce at least one golden and one dead cross
CLOSES = [10.0, 10.0, 10.0, 10.0, 14.0, 15.0, 9.0, 8.0, 8.0, 15.0, 16.0, 7.0]


def _candle_line(i, close):
    return json.dumps(
        {
            "currency_pair_symbol": "USD_JPY",
            "time": f"2024-01-01T10:{i:02d}:00.000Z",
            "close": close,
        }
    )


def _batch_events(spark):
    rows = [
        ("USD/JPY", "1m", __import__("datetime").datetime(2024, 1, 1, 10, i), c)
        for i, c in enumerate(CLOSES)
    ]
    candles = spark.createDataFrame(
        rows, "currency_pair_code string, timeframe_code string, time timestamp, close double"
    )
    fact = indicators.sma(candles, SHORT).unionByName(indicators.sma(candles, LONG))
    ev = signals.buysell_events(fact, SHORT, LONG)
    return {
        (r["event_datetime"].minute, r["event_type"]) for r in ev.collect()
    }


def _stream_events(spark, tmp_path, split_at):
    src, sink, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    (tmp_path / "in").mkdir()
    schema = "currency_pair_symbol string, time timestamp, close double"

    def run():
        candles = spark.readStream.schema(schema).json(src)
        q = (
            stream_sma_cross(candles, SHORT, LONG)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (tmp_path / "in" / "a.jsonl").write_text(
        "\n".join(_candle_line(i, c) for i, c in enumerate(CLOSES[:split_at])) + "\n"
    )
    run()
    (tmp_path / "in" / "b.jsonl").write_text(
        "\n".join(
            _candle_line(i + split_at, c) for i, c in enumerate(CLOSES[split_at:])
        )
        + "\n"
    )
    run()
    return {
        (r["time"].minute, r["event_type"])
        for r in spark.read.parquet(sink).collect()
    }


def test_stream_cross_matches_batch_across_restart(spark, tmp_path):
    batch = _batch_events(spark)
    assert {"BUY", "SELL"} <= {t for _, t in batch}  # fixture fires both
    stream = _stream_events(spark, tmp_path, split_at=6)
    assert stream == batch


def test_stream_cross_rejects_bad_periods(spark, tmp_path):
    with pytest.raises(ValueError):
        stream_sma_cross(
            spark.readStream.schema("currency_pair_symbol string, time timestamp, close double")
            .json(str(tmp_path)),
            3,
            3,
        )
