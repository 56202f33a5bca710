"""Relay sink behaviors: heartbeat (R4) and error-frame + retry (R5).

The reference's websocket relay runs two sink-side loops next to its DB
poller (``src/gmo/ws_ticker_server.py``):

- a heartbeat broadcast every ``HEARTBEAT_INTERVAL_SECONDS = 30``
  (:51, :257-261): ``{"type": "heartbeat", "timestamp": ...}``;
- on a polling failure, an error frame
  ``{"type": "error", "code": "DB_POLLING_FAILED", ...}`` then a
  ``DB_ERROR_RETRY_SECONDS = 3`` sleep and retry (:245-256).

In Structured Streaming the poll loop is the micro-batch cadence, so both
behaviors belong in the ``foreachBatch`` hook. ``RelayHook`` wraps any batch
processor with exactly those semantics; clock/sleep are injectable so the
contract is unit-testable without wall-clock waits
(tests/test_streaming.py). If every retry fails the exception propagates —
the stream restarts from the checkpoint, which is the Spark-native outer
retry loop.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame

HEARTBEAT_INTERVAL_SECONDS = 30.0  # ws_ticker_server.py:51
DB_ERROR_RETRY_SECONDS = 3.0  # ws_ticker_server.py:55


def _utc_now_iso() -> str:
    # ws_ticker_server.py:58-59
    return (
        datetime.now(timezone.utc)
        .isoformat(timespec="milliseconds")
        .replace("+00:00", "Z")
    )


class RelayHook:
    """foreachBatch wrapper adding heartbeat emission and error-frame retry.

    ``process(batch_df, batch_id)`` is the real sink logic. ``emit`` receives
    protocol frames (heartbeat / error dicts) — in production that is the
    push to subscribers; tests pass a list-appender. A heartbeat is emitted
    after any batch that completes once ``heartbeat_interval`` has elapsed
    since the previous one (micro-batch cadence stands in for the reference's
    timer loop; with the relay's 1 s poll trigger the 30 s contract holds to
    within one batch).
    """

    def __init__(
        self,
        process: Callable[[DataFrame, int], None],
        emit: Callable[[dict], None],
        *,
        heartbeat_interval: float = HEARTBEAT_INTERVAL_SECONDS,
        retry_seconds: float = DB_ERROR_RETRY_SECONDS,
        max_retries: int = 1,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        now_iso: Callable[[], str] = _utc_now_iso,
    ):
        self.process = process
        self.emit = emit
        self.heartbeat_interval = heartbeat_interval
        self.retry_seconds = retry_seconds
        self.max_retries = max_retries
        self.clock = clock
        self.sleep = sleep
        self.now_iso = now_iso
        self._last_beat = clock()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        attempt = 0
        while True:
            try:
                self.process(batch_df, batch_id)
                break
            except Exception as exc:
                # R5: error frame + fixed retry delay (ws_ticker_server.py:245-256)
                self.emit(
                    {
                        "type": "error",
                        "code": "DB_POLLING_FAILED",
                        "message": f"batch {batch_id} failed: {exc}",
                        "timestamp": self.now_iso(),
                    }
                )
                if attempt >= self.max_retries:
                    raise  # stream restart (checkpoint replay) is the outer retry
                attempt += 1
                self.sleep(self.retry_seconds)
        # R4: heartbeat once the interval has elapsed (ws_ticker_server.py:257-261)
        now = self.clock()
        if now - self._last_beat >= self.heartbeat_interval:
            self.emit({"type": "heartbeat", "timestamp": self.now_iso()})
            self._last_beat = now
