"""The mechanical bench-adjudication rule (tools/adjudicate.py) must apply
the documented burst-bracket logic exactly: REAL needs a move past both
the relative and absolute thresholds UNDER flat brackets; loaded brackets
convert the same move to LOAD; small moves are FLAT regardless."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from adjudicate import ABS_FLOOR_SEC, LOAD_THRESHOLD, adjudicate


def _detail(queries_min, bursts):
    return {
        "queries_min": queries_min,
        "host_canary": {
            "cpu_codegen_bursts": [
                {"at": at, "t_rel_sec": i, "samples": [m], "min_sec": m}
                for i, (at, m) in enumerate(bursts)
            ]
        },
    }


_FLAT_BURSTS = [
    ("pre_cold", 0.10),
    ("post_chain_cold", 0.10),
    ("post_cache_cold", 0.10),
    ("post_train_cold", 0.10),
    ("post_index_cold", 0.10),
    *[(f"post_headline_round_{i}", 0.10) for i in range(1, 6)],
    ("post_pruning_lines", 0.10),
    ("post_bucket_lines", 0.10),
    ("post_skew_lines", 0.10),
    ("end", 0.10),
]


def _verdicts(prev_min, cur_min, bursts, prev_bursts=None):
    rows = adjudicate(
        _detail(prev_min, prev_bursts or []), _detail(cur_min, bursts)
    )
    return {r["line"]: r["verdict"] for r in rows}


def test_real_regression_under_flat_brackets():
    v = _verdicts(
        {"candle_cache_cold": 3.0}, {"candle_cache_cold": 4.0}, _FLAT_BURSTS
    )
    assert v["candle_cache_cold"] == "REAL"


def test_same_move_under_loaded_brackets_is_load():
    # position-wise: the same bursts were quiet last round, so a bracket
    # that sits 20% above its SAME-LABEL prior reading marks the block
    # loaded and the line's move adjudicates LOAD
    loaded = [
        (at, m * 1.2 if at in ("post_chain_cold", "post_cache_cold") else m)
        for at, m in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"candle_cache_cold": 3.0}, {"candle_cache_cold": 4.0}, loaded,
        prev_bursts=_FLAT_BURSTS,
    )
    assert v["candle_cache_cold"] == "LOAD"


def test_jvm_maturation_gradient_does_not_read_as_load():
    # early bursts sit structurally ABOVE the end-of-run floor in EVERY
    # round (the JVM matures over the run) — position-wise comparison
    # holds that constant, so an early-block regression under the same
    # gradient as last round is REAL, not LOAD
    gradient = [
        (at, 0.20 if at in ("pre_cold", "post_chain_cold", "post_cache_cold")
         else m)
        for at, m in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"candle_cache_cold": 3.0}, {"candle_cache_cold": 4.0}, gradient,
        prev_bursts=gradient,
    )
    assert v["candle_cache_cold"] == "REAL"


def test_faster_line_under_released_brackets_is_load():
    # a -20% line under brackets that also dropped 20% position-wise is
    # the host speeding up, not an engine win
    quiet = [
        (at, m / 1.2 if at in ("post_chain_cold", "post_cache_cold") else m)
        for at, m in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"candle_cache_cold": 4.0}, {"candle_cache_cold": 3.0}, quiet,
        prev_bursts=_FLAT_BURSTS,
    )
    assert v["candle_cache_cold"] == "LOAD"


def test_subsecond_jitter_is_flat_despite_large_relative_move():
    # the measured same-code r16 class: +17% on a 0.5 s line is sampling
    # noise, not a regression — the absolute floor keeps it FLAT
    assert 0.59 - 0.50 < ABS_FLOOR_SEC
    v = _verdicts(
        {"embedding_knn_bruteforce": 0.50},
        {"embedding_knn_bruteforce": 0.59},
        _FLAT_BURSTS,
    )
    assert v["embedding_knn_bruteforce"] == "FLAT"


def test_headline_line_uses_least_moved_round_bracket():
    # four loud headline rounds + ONE flat one vs prior: min-of-5 needs
    # only one quiet round, so the line adjudicates against the
    # least-moved bracket (flat) and a real move stays REAL
    bursts = [
        (at, 0.30 if at.startswith("post_headline_round_")
         and at != "post_headline_round_3" else m)
        for at, m in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"event_asof_tick": 2.0}, {"event_asof_tick": 2.6}, bursts,
        prev_bursts=_FLAT_BURSTS,
    )
    assert v["event_asof_tick"] == "REAL"


def test_missing_baseline_reported_not_crashed():
    v = _verdicts({}, {"new_line": 1.0}, _FLAT_BURSTS)
    assert v["new_line"] == "NO-BASELINE"
