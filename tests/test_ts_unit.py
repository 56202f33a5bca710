"""Epoch-unit detection for the events ``ts`` column (ADVICE r3).

The fixture corpus has shipped different ts encodings across driver rounds
(raw INT64 nanos in r1, TIMESTAMP(MICROS) since r2). The adapter must read
every plausible encoding to the SAME timestamps — including UNANNOTATED
int64, where the unit is inferred from value magnitude, not assumed."""

from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from trading_etl_spark.sources.ticks import _events_ts_unit, load_events

# one instant, every encoding
INSTANT = datetime(2024, 3, 1, 12, 34, 56, 789000, tzinfo=timezone.utc)
EPOCH_US = int(INSTANT.timestamp() * 1_000_000)


def _write_events(base, ts_array):
    """Write an sf_dir-shaped directory holding events.parquet; return it."""
    n = len(ts_array)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([100.0] * n, pa.float64()),
            "props": pa.array(['{"k": 3}'] * n, pa.string()),
        }
    )
    base.mkdir(exist_ok=True)
    pq.write_table(table, base / "events.parquet")
    return str(base)


@pytest.mark.parametrize(
    "unit,factor",
    [("ns", 1000), ("us", 1), ("ms", 1 / 1000), ("s", 1 / 1_000_000)],
)
def test_unannotated_int64_unit_inferred_from_magnitude(tmp_path, unit, factor):
    raw = int(EPOCH_US * factor)
    sf_dir = _write_events(tmp_path / unit, pa.array([raw], pa.int64()))
    assert _events_ts_unit(f"{sf_dir}/events.parquet") == unit


def test_annotated_timestamps_detected(tmp_path):
    us = _write_events(tmp_path / "us", pa.array([EPOCH_US], pa.timestamp("us")))
    ns = _write_events(
        tmp_path / "ns", pa.array([EPOCH_US * 1000], pa.timestamp("ns"))
    )
    assert _events_ts_unit(f"{us}/events.parquet") is None  # Spark-native
    assert _events_ts_unit(f"{ns}/events.parquet") == "ns"


def test_every_encoding_reads_identical_timestamps(spark, tmp_path):
    expected = INSTANT.replace(tzinfo=None)
    cases = {
        "int_ns": pa.array([EPOCH_US * 1000], pa.int64()),
        "int_us": pa.array([EPOCH_US], pa.int64()),
        "int_ms": pa.array([EPOCH_US // 1000], pa.int64()),
        "int_s": pa.array([EPOCH_US // 1_000_000], pa.int64()),
        "t_us": pa.array([EPOCH_US], pa.timestamp("us")),
        "t_ms": pa.array([EPOCH_US // 1000], pa.timestamp("ms")),
        "t_ns": pa.array([EPOCH_US * 1000], pa.timestamp("ns")),
    }
    for name, arr in cases.items():
        sf_dir = _write_events(tmp_path / name, arr)
        got = load_events(spark, sf_dir).select("ts").first()["ts"]
        # second-resolution storage has no sub-second to recover
        want = expected.replace(microsecond=0) if name == "int_s" else expected
        assert got == want, f"{name}: {got!r} != {want!r}"


def test_unit_inference_null_and_sentinel_first_values(tmp_path):
    """ADVICE r4: a NULL first value must not raise and a 0-sentinel first
    row must not decide the unit — the probe is the footer-stats max over
    the whole file (stats ignore nulls; max dominates sentinels)."""
    arr = pa.array([None, 0, EPOCH_US], pa.int64())
    sf_dir = _write_events(tmp_path / "mixed", arr)
    assert _events_ts_unit(f"{sf_dir}/events.parquet") == "us"


def test_unit_inference_all_null_and_empty_fall_back(tmp_path):
    """All-null and zero-row int64 ts columns are undecidable: default to
    µs (Spark's native epoch unit) instead of raising."""
    allnull = _write_events(tmp_path / "allnull", pa.array([None, None], pa.int64()))
    assert _events_ts_unit(f"{allnull}/events.parquet") == "us"
    empty = _write_events(tmp_path / "empty", pa.array([], pa.int64()))
    assert _events_ts_unit(f"{empty}/events.parquet") == "us"
