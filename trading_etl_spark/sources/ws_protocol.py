"""Pure websocket-connector protocol logic — testable without a network.

Re-expresses the behavioral contract of the reference's hand-rolled client
(``src/gmo/ws-connection.py``) as side-effect-free functions, so the live
mode of the ``gmo_ticks`` DataSource (tick_ws_source.py) drives a socket
with logic that is unit-tested offline:

- subscribe pacing: one subscribe frame per symbol with an inter-send delay
  to dodge the feed's subscribe rate limit (ws-connection.py:114-129);
- rate-limit detection: an error frame carrying ``"ERR-5003 Request too
  many."`` means close + back off before reconnecting (:133-141);
- frame classification: subscribe acks / unknown frames are ignored, only
  complete ticker frames flow downstream (:142-145);
- reconnect backoff: the reference sleeps a constant
  ``RECONNECT_BACKOFF_SECONDS`` between ``run_forever`` attempts (:168-172);
  an optional exponential-with-cap schedule is provided for flappy links —
  attempt 0 reproduces the reference's constant exactly.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

# Reference constants: ws-connection.py:14-16 (env-overridable there too).
SUBSCRIBE_INTERVAL_SECONDS = 1.0
RECONNECT_BACKOFF_SECONDS = 5.0
RATE_LIMIT_ERROR = "ERR-5003 Request too many."

TICK_REQUIRED_KEYS = ("symbol", "timestamp", "bid", "ask")


@dataclass(frozen=True)
class SubscribeStep:
    """One step of the subscribe plan: send ``message``, then wait
    ``delay_after`` seconds before the next send."""

    message: str
    delay_after: float


def subscribe_plan(
    symbols: list[str],
    channel: str = "ticker",
    interval_seconds: float = SUBSCRIBE_INTERVAL_SECONDS,
) -> list[SubscribeStep]:
    """Paced subscribe frames, one per symbol (ws-connection.py:114-129).

    The delay follows every send except the last — total connect latency is
    ``(n-1) × interval``, matching the reference's ``time.sleep`` placement
    closely enough that the feed's rate limit is never hit.
    """
    steps = []
    for i, symbol in enumerate(symbols):
        msg = json.dumps(
            {"command": "subscribe", "channel": channel, "symbol": symbol}
        )
        delay = interval_seconds if i < len(symbols) - 1 else 0.0
        steps.append(SubscribeStep(msg, delay))
    return steps


def classify_frame(text: str) -> tuple[str, dict | None]:
    """('tick'|'rate_limited'|'ignored', parsed) for one incoming frame.

    - ``rate_limited``: error frame matching the feed's ERR-5003 message →
      caller must close and back off (ws-connection.py:133-141);
    - ``tick``: all of symbol/timestamp/bid/ask present (:142-145);
    - ``ignored``: subscribe acks, unknown frames, malformed JSON.
    """
    try:
        data = json.loads(text)
    except (ValueError, TypeError):
        return ("ignored", None)
    if not isinstance(data, dict):
        return ("ignored", None)
    if data.get("error") == RATE_LIMIT_ERROR:
        return ("rate_limited", data)
    if all(k in data for k in TICK_REQUIRED_KEYS):
        return ("tick", data)
    return ("ignored", data)


def reconnect_backoff(
    attempt: int,
    base_seconds: float = RECONNECT_BACKOFF_SECONDS,
    exponential: bool = False,
    cap_seconds: float = 60.0,
) -> float:
    """Seconds to wait before reconnect ``attempt`` (0-based).

    Default is the reference's constant schedule (ws-connection.py:168-172).
    ``exponential=True`` doubles per attempt up to ``cap_seconds`` — attempt
    0 still equals ``base_seconds`` so the first retry matches the reference.
    """
    if attempt < 0:
        raise ValueError("attempt must be >= 0")
    if not exponential:
        return base_seconds
    return min(base_seconds * (2**attempt), cap_seconds)
