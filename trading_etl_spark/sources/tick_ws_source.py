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
import time
from collections.abc import Callable, Iterator

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

from . import ws_protocol

FRAME_SCHEMA = "frame string"
BASE_EPOCH = 1704103200  # 2024-01-01T10:00:00Z — deterministic feed origin


class LiveFeed:
    """Protocol-complete live-feed loop over an injectable transport.

    Encapsulates everything the reference's ``Streamer`` does around the
    socket (``ws-connection.py:99-172``) — paced subscribes, rate-limit
    close + backoff, reconnect loop — against a transport object providing
    ``connect() -> iterator-of-frames``, ``send(str)`` and ``close()``.
    Tests drive it with a fake transport (tests/test_ws_protocol.py); the
    live DataSource path would pass a websocket-client adapter.
    """

    def __init__(
        self,
        transport_factory: Callable[[], object],
        symbols: list[str],
        *,
        sleep: Callable[[float], None] = time.sleep,
        max_connects: int = 3,
        exponential: bool = False,
    ):
        self.transport_factory = transport_factory
        self.symbols = symbols
        self.sleep = sleep
        self.max_connects = max_connects
        self.exponential = exponential

    def run(self, emit: Callable[[dict], None]) -> int:
        """Connect/subscribe/consume until ``max_connects`` sessions end;
        emits parsed tick dicts. Returns the number of connect attempts."""
        attempts = 0
        while attempts < self.max_connects:
            transport = self.transport_factory()
            frames = transport.connect()
            for step in ws_protocol.subscribe_plan(self.symbols):
                transport.send(step.message)
                if step.delay_after:
                    self.sleep(step.delay_after)
            for frame in frames:
                kind, data = ws_protocol.classify_frame(frame)
                if kind == "rate_limited":
                    transport.close()  # close + back off, ws-connection.py:133-141
                    break
                if kind == "tick":
                    emit(data)
                # 'ignored' frames (subscribe acks, junk) fall through
            attempts += 1
            if attempts < self.max_connects:
                self.sleep(
                    ws_protocol.reconnect_backoff(
                        attempts - 1, exponential=self.exponential
                    )
                )
        return attempts


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
            # Protocol logic (paced subscribe plan, rate-limit handling,
            # reconnect backoff) lives in LiveFeed/ws_protocol and is fully
            # unit-tested offline; only the socket transport itself needs
            # the websocket-client package, absent from this container.
            self.subscribe_steps = ws_protocol.subscribe_plan(self.pairs)
            try:
                import websocket  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "live mode needs the websocket-client package (not in "
                    "this container); use mode=synthetic — the connector "
                    "logic itself is implemented+tested (LiveFeed)"
                ) from exc
            raise NotImplementedError(
                "live socket transport adapter not wired; drive LiveFeed "
                "with a websocket-client transport"
            )

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
