"""The mechanical bench-adjudication rule (tools/adjudicate.py) must apply
the documented burst-bracket logic exactly: REAL needs a move past both
the relative and absolute thresholds UNDER flat brackets; loaded brackets
convert the same move to LOAD; small moves are FLAT regardless; a prior
record with no same-labeled bursts makes a big move INDETERMINATE (never
a silent pass — ADVICE r16 #1); block lines use the ANY-bracket rule in
the move's direction (ADVICE r16 #2); headline labels are derived from
the record, not hardcoded to five rounds (ADVICE r16 #3); total-less
artifacts are rejected with their own message (VERDICT r16 #3)."""

import sys
from pathlib import Path

import pytest

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
        {"candle_cache_cold": 3.0}, {"candle_cache_cold": 4.0}, _FLAT_BURSTS,
        prev_bursts=_FLAT_BURSTS,
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


def test_one_risen_bracket_excuses_a_block_regression():
    # the ANY-bracket rule: load arriving mid-block moves only the
    # CLOSING bracket — that alone converts the regression to LOAD
    # (documented rationale; the opening bracket stays flat)
    loaded_close = [
        (at, m * 1.2 if at == "post_cache_cold" else m)
        for at, m in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"candle_cache_cold": 3.0}, {"candle_cache_cold": 4.0}, loaded_close,
        prev_bursts=_FLAT_BURSTS,
    )
    assert v["candle_cache_cold"] == "LOAD"


def test_one_dropped_bracket_excuses_a_block_improvement():
    # direction-aware fix (ADVICE r16 #2): the r16 max(pairs) rule read a
    # one-bracket DROP as flat for improvements, over-claiming wins — an
    # improvement under a dropped opening bracket must adjudicate LOAD
    quiet_open = [
        (at, m / 1.3 if at == "post_chain_cold" else m)
        for at, m in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"candle_cache_cold": 4.0}, {"candle_cache_cold": 3.0}, quiet_open,
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
        prev_bursts=_FLAT_BURSTS,
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
    v = _verdicts({}, {"new_line": 1.0}, _FLAT_BURSTS,
                  prev_bursts=_FLAT_BURSTS)
    assert v["new_line"] == "NO-BASELINE"


def test_pre_burst_prev_record_makes_big_moves_indeterminate():
    # ADVICE r16 #1: vs a pre-r16 record (no burst series) the bracket
    # rule cannot run — the old within-run-floor fallback read every
    # bracket at 1.3-3.4x (JVM maturation) and excused ANY regression as
    # LOAD while stamping improvements REAL. Both directions must now be
    # INDETERMINATE; small moves stay FLAT.
    v = _verdicts(
        {"candle_cache_cold": 3.0, "kmeans_train_cold": 3.0,
         "event_asof_tick": 2.0},
        {"candle_cache_cold": 4.0, "kmeans_train_cold": 2.0,
         "event_asof_tick": 2.05},
        _FLAT_BURSTS,
    )
    assert v["candle_cache_cold"] == "INDETERMINATE"  # regression
    assert v["kmeans_train_cold"] == "INDETERMINATE"  # improvement
    assert v["event_asof_tick"] == "FLAT"


def test_totalless_artifact_rejected_with_own_message():
    # VERDICT r16 what's-wrong #3: the historical BENCH_r06-r08 driver
    # artifacts hold no parsed totals and no queries_min — passing one as
    # the previous record must fail loudly, not adjudicate every line
    # NO-BASELINE and exit 0
    with pytest.raises(SystemExit, match="queries_min"):
        adjudicate(
            {"metric": "suite", "total": None},
            _detail({"x": 1.0}, _FLAT_BURSTS),
        )


def test_headline_labels_derived_from_record_not_hardcoded():
    # ADVICE r16 #3: a bench run with a different round count (e.g. 3)
    # must still bracket headline lines against ITS rounds, not a
    # hardcoded range(1, 6)
    three_rounds = [
        (at, m) for at, m in _FLAT_BURSTS
        if not at.startswith("post_headline_round_")
    ] + [(f"post_headline_round_{i}", 0.30) for i in range(1, 4)]
    prev3 = [
        (at, m) for at, m in _FLAT_BURSTS
        if not at.startswith("post_headline_round_")
    ] + [(f"post_headline_round_{i}", 0.10) for i in range(1, 4)]
    v = _verdicts(
        {"event_asof_tick": 2.0}, {"event_asof_tick": 2.6}, three_rounds,
        prev_bursts=prev3,
    )
    # every round is 3x louder than prior -> the regression is LOAD;
    # with hardcoded 1..6 labels the derivation would still find them,
    # so also check the malformed-record guard below
    assert v["event_asof_tick"] == "LOAD"


def test_missing_block_bracket_label_is_rejected():
    # a record thinned of a block bracket label must error, not silently
    # adjudicate that block against a weaker bracket set
    thinned = [(at, m) for at, m in _FLAT_BURSTS if at != "post_bucket_lines"]
    with pytest.raises(SystemExit, match="post_bucket_lines"):
        adjudicate(
            _detail({"x": 1.0}, _FLAT_BURSTS),
            _detail({"x": 1.0}, thinned),
        )
