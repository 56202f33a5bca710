"""Offline tests for the websocket connector protocol logic (S1 live-path
behaviors: subscribe pacing, rate-limit detection, reconnect backoff) and
the LiveFeed loop over a fake transport — no network, no websocket package."""

import json

from trading_etl_spark.sources import ws_protocol as wsp
from trading_etl_spark.sources.tick_ws_source import LiveFeed


def test_subscribe_plan_paces_between_sends():
    steps = wsp.subscribe_plan(["USD_JPY", "EUR_JPY", "GBP_JPY"])
    assert len(steps) == 3
    for step, symbol in zip(steps, ["USD_JPY", "EUR_JPY", "GBP_JPY"]):
        msg = json.loads(step.message)
        assert msg == {"command": "subscribe", "channel": "ticker", "symbol": symbol}
    # delay after every send except the last
    assert [s.delay_after for s in steps] == [1.0, 1.0, 0.0]


def test_classify_frame_kinds():
    tick = json.dumps(
        {"symbol": "USD_JPY", "timestamp": "2024-01-01T00:00:00.000Z",
         "bid": "100.1", "ask": "100.2"}
    )
    assert wsp.classify_frame(tick)[0] == "tick"
    rate = json.dumps({"error": "ERR-5003 Request too many."})
    assert wsp.classify_frame(rate)[0] == "rate_limited"
    ack = json.dumps({"command": "subscribe", "status": "ok"})
    assert wsp.classify_frame(ack)[0] == "ignored"
    assert wsp.classify_frame("not json{")[0] == "ignored"
    assert wsp.classify_frame(json.dumps([1, 2]))[0] == "ignored"
    # other errors are NOT rate limits
    assert wsp.classify_frame(json.dumps({"error": "ERR-9999 other"}))[0] == "ignored"


def test_reconnect_backoff_schedules():
    # reference behavior: constant 5 s between reconnects
    assert [wsp.reconnect_backoff(a) for a in range(3)] == [5.0, 5.0, 5.0]
    # exponential option: attempt 0 still matches the reference constant
    assert wsp.reconnect_backoff(0, exponential=True) == 5.0
    assert wsp.reconnect_backoff(2, exponential=True) == 20.0
    assert wsp.reconnect_backoff(10, exponential=True) == 60.0  # capped


class FakeTransport:
    """Scripted transport: yields one session's frames, records sends."""

    def __init__(self, frames, log):
        self.frames = frames
        self.log = log

    def connect(self):
        self.log.append("connect")
        return iter(self.frames)

    def send(self, msg):
        self.log.append(("send", json.loads(msg)["symbol"]))

    def close(self):
        self.log.append("close")


def test_livefeed_subscribes_consumes_and_reconnects():
    tick = json.dumps(
        {"symbol": "USD_JPY", "timestamp": "2024-01-01T00:00:00.000Z",
         "bid": "100.1", "ask": "100.2"}
    )
    ack = json.dumps({"command": "subscribe", "status": "ok"})
    sessions = [[ack, tick, tick], [tick]]
    log, sleeps, ticks = [], [], []
    it = iter(sessions)
    feed = LiveFeed(
        lambda: FakeTransport(next(it), log),
        ["USD_JPY", "EUR_JPY"],
        sleep=sleeps.append,
        max_connects=2,
    )
    n = feed.run(ticks.append)
    assert n == 2
    assert ticks and len(ticks) == 3  # acks ignored, ticks emitted
    assert log.count("connect") == 2
    # paced subscribe: 2 symbols → 1 inter-send pause per session
    assert sleeps.count(1.0) == 2
    # one reconnect backoff between the two sessions
    assert sleeps.count(5.0) == 1


def test_livefeed_rate_limit_closes_and_backs_off():
    rate = json.dumps({"error": "ERR-5003 Request too many."})
    log, sleeps, ticks = [], [], []
    feed = LiveFeed(
        lambda: FakeTransport([rate], log),
        ["USD_JPY"],
        sleep=sleeps.append,
        max_connects=2,
    )
    feed.run(ticks.append)
    assert ticks == []
    assert log.count("close") >= 1  # rate limit → immediate close
    assert 5.0 in sleeps  # then back off before reconnecting
