"""Dead-letter routing: the validation gate must tag every rejected event
with exactly one reason and keep its full payload; valid rows must equal
the silent-drop tickify output exactly."""

from datetime import datetime

from pyspark.sql import functions as F

from trading_etl_spark.sources.ticks import tickify, tickify_with_dlq


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double,"
        " props string, event_type string"
    )


def test_dlq_reasons_and_valid_parity(spark):
    t = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 0, t, 100.0, '{"k": 3}', "view"),    # valid
        (2, 1, t, -5.0, '{"k": 1}', "view"),     # nonpositive bid
        (3, 2, t, None, '{"k": 1}', "view"),     # missing value
        (4, 3, t, 100.0, "not json", "view"),    # bad props → null spread
        (5, 4, t, 100.0, '{"k": 7}', "view"),    # valid
    ]
    ev = _events(spark, rows)
    ticks, dlq = tickify_with_dlq(ev)
    reasons = {r.event_id: r.dlq_reason for r in dlq.collect()}
    assert reasons == {
        2: "nonpositive_bid",
        3: "missing_value",
        4: "bad_props_spread",
    }
    # quarantined rows keep the full original payload
    bad = {r.event_id: r for r in dlq.collect()}
    assert bad[4].props == "not json" and bad[4].value == 100.0
    # the valid side is EXACTLY the silent-drop path
    got = sorted(tuple(r) for r in ticks.collect())
    want = sorted(tuple(r) for r in tickify(ev).collect())
    assert got == want and len(got) == 2


def test_dlq_empty_on_clean_feed(spark):
    t = datetime(2024, 1, 1, 12, 0, 0)
    ev = _events(
        spark, [(i, i, t, 100.0 + i, '{"k": 2}', "view") for i in range(6)]
    )
    ticks, dlq = tickify_with_dlq(ev)
    assert dlq.count() == 0
    assert ticks.count() == 6
