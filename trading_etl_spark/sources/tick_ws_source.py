"""Custom Python streaming data source for GMO-shaped tick frames (S1).

The reference's ingest is a hand-rolled websocket client
(``src/gmo/ws-connection.py:99-172``: per-symbol subscribe with 1 s pacing,
rate-limit detection, reconnect backoff). In Spark 4 the idiomatic equivalent
is a Python ``DataSource`` + ``DataSourceStreamReader`` (PEP-faithful
pyspark.sql.datasource API): offsets are frame indices, so restarts resume
exactly where the checkpoint left off — replacing the reference's
reconnect/backoff loop with engine-managed recovery.

Two feed modes:
- ``synthetic`` (default): a deterministic offline frame generator — no
  network, no randomness — producing the exact JSON frame shape of the live
  feed (``docs/ws_ticker_spec.md:20-51``). Used by tests and local runs.
- ``live``: would subscribe to ``wss://forex-api.coin.z.com/ws/public/v1``
  via the ``websocket-client`` package; that package is not installed in
  this container, so the path is gated behind an import and raises
  ``NotImplementedError`` with the gate intact.

Usage::

    spark.dataSource.register(GmoTickDataSource)
    frames = (spark.readStream.format("gmo_ticks")
              .option("pairs", "USD_JPY,EUR_JPY")
              .option("frames_per_batch", "10").load())
    ticks = dedup_ticks(parse_ticks(frames))   # same pipeline as file feed

Scale notes: one InputPartition per (batch slice × pair) would shard a
multi-symbol firehose across executors; offsets commit per micro-batch so a
1000-executor cluster replays nothing on failover.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

FRAME_SCHEMA = "frame string"
BASE_EPOCH = 1704103200  # 2024-01-01T10:00:00Z — deterministic feed origin


class _FrameRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def synthetic_frame(i: int, pairs: list[str]) -> str:
    """Deterministic GMO-shaped ticker frame #i (no randomness — replayable
    from any offset, which is what makes exactly-once recovery testable)."""
    pair = pairs[i % len(pairs)]
    base = 100.0 + 10.0 * (i % len(pairs))
    bid = base + (i * 37 % 100) / 100.0
    ask = bid + 0.02
    sec = BASE_EPOCH + i // len(pairs)
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(sec, tz=timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.000Z")
    return json.dumps(
        {
            "type": "ticker",
            "symbol": pair,
            "timestamp": ts,
            "bid": f"{bid:.3f}",
            "ask": f"{ask:.3f}",
        }
    )


class GmoTickStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.pairs = [p.strip() for p in options.get("pairs", "USD_JPY").split(",")]
        self.frames_per_batch = int(options.get("frames_per_batch", "10"))
        self.max_frames = int(options.get("max_frames", "100"))
        self.mode = options.get("mode", "synthetic")
        if self.mode == "live":
            try:
                import websocket  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "live mode needs the websocket-client package (not in "
                    "this container); use mode=synthetic"
                ) from exc
            raise NotImplementedError("live websocket subscribe not implemented yet")

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # synthetic feed "produces" frames_per_batch new frames per poll,
        # bounded by max_frames so availableNow drains deterministically.
        if not hasattr(self, "_latest"):
            self._latest = 0
        self._latest = min(self._latest + self.frames_per_batch, self.max_frames)
        return {"index": self._latest}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [_FrameRange(start["index"], end["index"])]

    def read(self, partition: _FrameRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (synthetic_frame(i, self.pairs),)

    def commit(self, end: dict) -> None:
        pass  # synthetic feed needs no source-side cleanup


class GmoTickDataSource(DataSource):
    """``spark.readStream.format("gmo_ticks")`` — frame stream source."""

    @classmethod
    def name(cls) -> str:
        return "gmo_ticks"

    def schema(self) -> str:
        return FRAME_SCHEMA

    def streamReader(self, schema) -> GmoTickStreamReader:
        return GmoTickStreamReader(self.options)
