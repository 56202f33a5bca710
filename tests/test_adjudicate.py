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
    # adjudicate that block against a weaker bracket set — the guard is
    # scoped to blocks whose LINE the current record carries (r17: so a
    # record frozen before a block existed stays adjudicable)
    thinned = [(at, m) for at, m in _FLAT_BURSTS if at != "post_bucket_lines"]
    with pytest.raises(SystemExit, match="post_bucket_lines"):
        adjudicate(
            _detail({"join_orderkey_bucketed": 1.0}, _FLAT_BURSTS),
            _detail({"join_orderkey_bucketed": 1.0}, thinned),
        )
    # the same thinned burst series is fine when the record does not carry
    # the block's line (a pre-block frozen record as the current side)
    rows = adjudicate(
        _detail({"x": 1.0}, _FLAT_BURSTS),
        _detail({"x": 1.0}, thinned),
    )
    assert rows[0]["verdict"] == "FLAT"


# --- IO (page-cache) excusal rule — r17 blind-spot closure --------------
# The measured failure class: memory pressure (the scaling probe churning
# its 100x fixtures) moved query lines +22%/+24% on git-identical code
# while the CPU brackets read QUIETER. The page-cache canary sees exactly
# that class: eviction turns the burst's first re-read cold (43x / +0.25 s
# calibrated; warm jitter <= 2x / ~0.005 s), so the io rule excuses moves
# the cpu rule cannot — and warm jitter must never qualify.

WARM_IO = 0.008
COLD_IO = 0.30  # calibrated eviction reading (0.26 s measured + margin)


def _io_detail(queries_min, bursts, io):
    """bursts: the cpu series; io: {label: io_first_sec} (default warm)."""
    return {
        "queries_min": queries_min,
        "host_canary": {
            "cpu_codegen_bursts": [
                {
                    "at": at,
                    "t_rel_sec": i,
                    "samples": [m],
                    "min_sec": m,
                    "io_samples": [io.get(at, WARM_IO), WARM_IO],
                    "io_first_sec": io.get(at, WARM_IO),
                    "io_rewarm_min_sec": WARM_IO,
                }
                for i, (at, m) in enumerate(bursts)
            ]
        },
    }


def _io_verdicts(prev_min, cur_min, cur_io, prev_io=None):
    rows = adjudicate(
        _io_detail(prev_min, _FLAT_BURSTS, prev_io or {}),
        _io_detail(cur_min, _FLAT_BURSTS, cur_io),
    )
    return {r["line"]: (r["verdict"], r["io_excused"]) for r in rows}


def test_block_regression_under_evicted_io_bracket_is_load():
    # cpu brackets flat (the r17 incident read them QUIETER), closing io
    # bracket cold -> the move is page-cache pressure, not the engine
    v = _io_verdicts(
        {"candle_cache_cold": 3.0},
        {"candle_cache_cold": 4.0},
        {"post_cache_cold": COLD_IO},
    )
    assert v["candle_cache_cold"] == ("LOAD", True)


def test_io_warm_jitter_cannot_excuse_a_real_regression():
    # 2x relative (< 3x threshold) AND +0.008 s (< 0.05 s floor): warm
    # jitter both ways — the regression stays REAL
    v = _io_verdicts(
        {"candle_cache_cold": 3.0},
        {"candle_cache_cold": 4.0},
        {"post_cache_cold": WARM_IO * 2},
    )
    assert v["candle_cache_cold"] == ("REAL", False)


def test_io_relative_move_below_abs_floor_cannot_excuse():
    # a 4x relative move that is still only +0.024 s absolute (fast-fs
    # noise) must not clear the 0.05 s floor
    v = _io_verdicts(
        {"candle_cache_cold": 3.0},
        {"candle_cache_cold": 4.0},
        {"post_cache_cold": WARM_IO * 4},
    )
    assert v["candle_cache_cold"] == ("REAL", False)


def test_missing_io_series_falls_back_to_cpu_rule():
    # prev record predates the io series: the io rule cannot run
    # (io_excused None) but the cpu rule still adjudicates — REAL under
    # flat cpu brackets, never INDETERMINATE
    rows = adjudicate(
        _detail({"candle_cache_cold": 3.0}, _FLAT_BURSTS),
        _io_detail({"candle_cache_cold": 4.0}, _FLAT_BURSTS, {}),
    )
    (row,) = [r for r in rows if r["line"] == "candle_cache_cold"]
    assert row["verdict"] == "REAL" and row["io_excused"] is None


def test_headline_regression_needs_every_round_io_loaded():
    # min-of-N needs only one quiet round: four cold rounds + one warm
    # round cannot excuse a headline regression...
    four_cold = {f"post_headline_round_{i}": COLD_IO for i in range(1, 5)}
    v = _io_verdicts(
        {"event_asof_tick": 2.0}, {"event_asof_tick": 2.6}, four_cold
    )
    assert v["event_asof_tick"] == ("REAL", False)
    # ...but every round cold can
    all_cold = {f"post_headline_round_{i}": COLD_IO for i in range(1, 6)}
    v = _io_verdicts(
        {"event_asof_tick": 2.0}, {"event_asof_tick": 2.6}, all_cold
    )
    assert v["event_asof_tick"] == ("LOAD", True)


def test_improvement_after_prior_round_eviction_is_load():
    # the mirror case: LAST round's bracket was cold (pressure), this
    # round is warm — the line's "improvement" is the pressure draining
    v = _io_verdicts(
        {"candle_cache_cold": 4.0},
        {"candle_cache_cold": 3.0},
        {},
        prev_io={"post_chain_cold": COLD_IO},
    )
    assert v["candle_cache_cold"] == ("LOAD", True)


# --- Sustained host-speed shift (r17, measured on a VM reboot) ----------
# The floor rule's raison d'être: after a reboot the whole run was
# uniformly ~25-50% slower (fixed-work canary floor +59%), yet the
# position-wise bracket rule read six git-identical lines REAL because a
# single NOISY prior-round burst (round_1 at 0.128 vs the 0.064 floor)
# set a flat baseline. When the floor ratio crosses 1.25x, a REAL whose
# line ratio lies within floor_shift x 1.3 in the shift's direction
# demotes to HOST-SHIFT; beyond the envelope it stays REAL.


def _shifted_bursts(level, noisy_round1=None):
    bursts = [(at, level) for at, _ in _FLAT_BURSTS]
    if noisy_round1 is not None:
        bursts = [
            (at, noisy_round1 if at == "post_headline_round_1" else m)
            for at, m in bursts
        ]
    return bursts


def test_uniform_slowdown_with_noisy_prior_round_is_host_shift():
    # prev: quiet 0.10 floor but round_1 burst noisy at 0.16; cur: ALL
    # bursts 0.16 (floor x1.6). The headline least-moved rule compares
    # against round_1 (ratio 1.0 — not loaded), so pre-r17 this read
    # REAL; the floor rule demotes it.
    v = _verdicts(
        {"event_asof_tick": 2.0},
        {"event_asof_tick": 2.8},  # +40%, within 1.6 * 1.3 = 2.08
        _shifted_bursts(0.16),
        prev_bursts=_shifted_bursts(0.10, noisy_round1=0.16),
    )
    assert v["event_asof_tick"] == "HOST-SHIFT"


def test_move_beyond_shifted_envelope_stays_real():
    # same floor shift, but the line moved x2.2 > 1.6 * 1.3 — an engine
    # regression ON TOP of the host shift must still block
    v = _verdicts(
        {"event_asof_tick": 2.0},
        {"event_asof_tick": 4.4},
        _shifted_bursts(0.16),
        prev_bursts=_shifted_bursts(0.10, noisy_round1=0.16),
    )
    assert v["event_asof_tick"] == "REAL"


def test_improvement_on_faster_host_is_host_shift_not_win():
    # the mirror: a genuinely faster host — MOST bursts dropped (median
    # x0.7, floor x0.7) — but the block's OWN brackets happen to read
    # flat position-wise (x0.95), so the bracket rule cannot excuse and
    # pre-floor-rule the line's drop would over-claim as an engine win.
    # (For headline lines a genuine floor drop always moves some round
    # bracket, so the bracket rule already excuses those — the floor
    # rule matters exactly for block lines with flat brackets.)
    cur = [
        (at, 0.095 if at in ("post_chain_cold", "post_cache_cold") else 0.07)
        for at, _ in _FLAT_BURSTS
    ]
    v = _verdicts(
        {"candle_cache_cold": 2.8},
        {"candle_cache_cold": 2.0},  # -29%, within the 0.7 / 1.3 envelope
        cur,
        prev_bursts=_shifted_bursts(0.10),
    )
    assert v["candle_cache_cold"] == "HOST-SHIFT"


def test_single_outlier_prior_sample_cannot_fake_a_host_shift():
    # the floor is a min over single samples; one anomalously FAST
    # sample in the prior record (turbo dip: one burst at 0.07 vs the
    # 0.10 steady state) yields floor ratio 1.43 >= 1.25 — but the
    # median position-wise burst ratio stays ~1.0, so the sustained
    # guard refuses the shift and a genuine regression STAYS REAL
    # (r17 self-review: without the median guard this demoted blocking
    # regressions to shippable exit 3 on one noisy sample)
    prev = _shifted_bursts(0.10, noisy_round1=None)
    prev = [
        (at, 0.07 if at == "post_headline_round_2" else m) for at, m in prev
    ]
    v = _verdicts(
        {"event_asof_tick": 2.0},
        {"event_asof_tick": 2.8},
        _shifted_bursts(0.10),
        prev_bursts=prev,
    )
    assert v["event_asof_tick"] == "REAL"


def test_flat_floor_never_demotes_real():
    # floor ratio 1.0: the demotion branch must not run — the original
    # REAL semantics are untouched on a stable host
    v = _verdicts(
        {"candle_cache_cold": 3.0}, {"candle_cache_cold": 4.0}, _FLAT_BURSTS,
        prev_bursts=_FLAT_BURSTS,
    )
    assert v["candle_cache_cold"] == "REAL"


# --- Real-record regression tests (frozen r17 fixtures) -----------------
# Two genuine BENCH_DETAIL records captured the same day on the same
# code: a discarded cold-boot run (VM restart — empty page cache, test-
# suite churn residue; candle_chain_cold 4.5x the settled run) and the
# settled run shipped as the round's record. Frozen under
# tests/fixtures/bench/ so the io-rule and sustained-guard behavior on
# real data stays reproducible — these are the records the rules were
# calibrated and validated against, not synthetic bursts.

import json as _json

_FIX = Path(__file__).resolve().parent / "fixtures" / "bench"


def _load(name):
    return _json.loads((_FIX / name).read_text())


def test_real_coldboot_record_chain_cold_excused_by_io_bracket():
    rows = adjudicate(
        _load("r17_settled_shipped.json"),
        _load("r17_coldboot_discarded.json"),
    )
    by = {r["line"]: r for r in rows}
    chain = by["candle_chain_cold"]
    # the +350% cold-boot blowup is excused: the post_chain_cold burst's
    # io_first read 0.074 vs 0.014 warm (x5.2, +0.060 s — past both the
    # 3x and 0.05 s floors), the eviction signature the probe exists for
    assert chain["verdict"] == "LOAD" and chain["io_excused"] is True
    assert chain["delta_pct"] > 300
    # and the whole pair adjudicates with NO real regression in the
    # slower direction — the cold boot is load, not an engine move
    assert not [
        r for r in rows
        if r["verdict"] == "REAL" and r.get("delta_pct", 0) > 0
    ]


def test_real_record_pair_drained_direction_is_load_not_host_shift():
    # the settled run is ~32% faster than the cold-boot run overall;
    # floor ratio x0.676 crosses the 1.25x threshold but the median
    # burst ratio x0.895 sits inside 1/1.15 — the sustained guard holds,
    # so the drained-pressure improvements read bracket LOAD (or FLAT),
    # never HOST-SHIFT and never REAL wins
    rows = adjudicate(
        _load("r17_settled_shipped.json"),
        _load("r17_coldboot_discarded.json"),
    )
    assert not [r for r in rows if r["verdict"] == "HOST-SHIFT"]
    assert not [
        r for r in rows
        if r["verdict"] == "REAL" and r.get("delta_pct", 0) < 0
    ]
