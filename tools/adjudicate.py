"""Mechanical bench adjudication (VERDICT r15 task #2 follow-through):
apply the burst-canary load-attribution rule to two rounds' shipped
records, so "did the engine regress or did the host load move?" is
decidable from the committed artifacts alone — no off-record re-runs.

Rule: a line's move is attributable to HOST LOAD iff A bracketing canary
burst of its block moved >= LOAD_THRESHOLD in the SAME direction as the
line, measured POSITION-WISE against the same-labeled bursts of the
previous record; a move under flat brackets is real engine behavior.
ANY-bracket (not both-brackets) on block lines is deliberate: load that
arrives mid-block moves only the closing bracket, and load that drains
mid-block moves only the opening one — requiring both would convert
either case into a false REAL (ADVICE r16 #2: this rationale is now the
documented rule, here and in bench.py/README). Headline lines are
round-interleaved (the min can come from ANY of the headline rounds), so
they adjudicate against the LEAST-moved round burst: a regression is
excusable as LOAD only if EVERY round was loud, an improvement only if
some round got quieter.

Position-wise (not vs the run's own quietest burst) because the JVM
matures over the whole bench run — a fresh canary descends 0.21 -> 0.06
across the run with NO external load (measured r16), so early bursts are
structurally above the end-of-run floor and a within-run floor comparison
would read every cold-block move as LOAD. Comparing burst[i] to burst[i]
of the prior round holds maturation state constant. When the previous
record predates the burst series (pre-r16) there is NO valid comparison:
the within-run-floor fallback the r16 version applied reads every
pre-r16 bracket at 1.3-3.4x (maturation), making the REAL-regression
gate vacuous against old baselines (ADVICE r16 #1) — such moves are now
reported INDETERMINATE and a regression among them exits 2, never a
silent 0.

Usage:
    python tools/adjudicate.py BENCH_DETAIL_prev.json [BENCH_DETAIL_cur.json]

The current record defaults to the repo's BENCH_DETAIL.json. BOTH records
must be BENCH_DETAIL payloads (per-query minima live there; the compact
BENCH_r{N}.json line holds medians) — a record without ``queries_min``,
e.g. the historical total-less BENCH_r06-r08 driver artifacts, is
rejected with its own message instead of silently adjudicating every
line NO-BASELINE (VERDICT r16 what's-wrong #3). Lines are compared on
MIN per the bench methodology. Output: one row per common line with the
move, its bracketing-burst state, and the verdict:

    REAL          moved past both thresholds under flat brackets
    LOAD          moved past both thresholds with a bracket moved the
                  same direction (any-bracket; headline: least-moved)
    HOST-SHIFT    would be REAL, but the run-wide canary floor moved
                  >= 25% between records WITH the median position-wise
                  burst ratio corroborating >= 15% the same direction
                  (differently-fast hosts — reboot/migration/sustained
                  throttle; the median guard keeps one anomalous prior
                  sample from faking a shift) and the line's ratio lies
                  within the floor shift x1.3, in the shift's direction
    FLAT          under the relative OR absolute move threshold
    INDETERMINATE moved past both thresholds but the previous record
                  carries no same-labeled bursts to compare against
    NO-BASELINE   line absent from the previous record

Exit status: 1 iff any REAL regression (slower, not faster); else 2 iff
any INDETERMINATE regression; else 3 iff any HOST-SHIFT verdict in
EITHER direction (a demoted regression or an un-claimable improvement —
both shippable only with the floor shift documented in the round
notes); else 0 — so the round workflow can gate on it without a
pre-burst baseline or a rebooted host ever reading as a clean pass.

IO excusal rule (r17, closing the blind spot measured earlier that
round): the CPU codegen probe cannot see IO/page-cache/memory pressure —
a bench run started right after tools/scaling_probe.py churned its 100x
fixtures through memory read two git-identical lines +22%/+24% REAL
under cpu brackets x0.69 (the probe's own independent sf0.1 timings
minutes earlier were FASTER than the prior record; a 60 s-settle re-run
read +0.9%/-3.6% FLAT). bench.py now times a page-cache canary re-read
(io_first_sec) at every burst: eviction by memory pressure turns the
first re-read cold (calibrated 43x warm on this host, shipped per-record
as pagecache_calib_{cold,warm}_sec). A line's move is ALSO attributable
to LOAD iff a bracketing burst's io_first_sec moved in the same
direction past BOTH IO_LOAD_THRESHOLD (3x — an order above the measured
<=2x warm jitter, an order below the 43x eviction step) and
IO_ABS_FLOOR_SEC (0.05 s — 5x the warm read itself), under the same
any-bracket / least-moved-round structure as the cpu rule. Both records
must carry the io series for the rule to run (first adjudicable pair:
r18); when only the cpu rule can run, a REAL verdict on git-identical
code still warrants an independent-context timing and a settle-delayed
re-run before acceptance. Residual blind spots (cgroup CPU throttling
would move the cpu brackets; pressure classes that evict neither probe)
keep that protocol worth retaining for git-identical REALs generally.
"""

from __future__ import annotations

import json
import os
import sys

LOAD_THRESHOLD = 1.15  # cpu bracket moved >= 15% position-wise
MOVE_THRESHOLD = 0.15  # |delta| below this needs no adjudication
# io (page-cache) bracket excusal: BOTH must clear — relative 3x (warm
# jitter measured <= 2x, eviction step 43x) and absolute 0.05 s (5x the
# warm 64 MiB read) — so warm-read noise can never excuse a line move
IO_LOAD_THRESHOLD = 3.0
IO_ABS_FLOOR_SEC = 0.05
# Sustained host-speed shift (r17, measured on a VM reboot): when the
# run-wide fixed-work canary floor — the host's best-case speed for the
# run — moved >= 25% between records, the records were produced by
# differently-fast hosts and line-level comparison is invalid: every line
# moves together with the floor, yet the position-wise bracket rule can
# still read REAL because a single NOISY prior-round burst sets a flat
# baseline (measured: floor +59%, end-burst +23%, all 35 lines +5-71%,
# six read REAL on git-identical code because prior round_1's burst was
# itself elevated). A REAL verdict whose line ratio lies within the
# floor shift x a 1.3 margin, in the shift's direction, demotes to
# HOST-SHIFT; a move that exceeds even the shifted envelope stays REAL.
#
# SUSTAINED means corroborated (r17 self-review): the floor is a min over
# single ~60-100 ms samples, and one anomalously fast sample in the PRIOR
# record (a turbo burst dip — single samples vary +/-30-70% per the bench
# methodology) could fake a >= 25% floor ratio and silently weaken the
# REAL gate. The shift therefore also requires the MEDIAN position-wise
# burst ratio to cross LOAD_THRESHOLD in the same direction — a reboot
# moves most bursts (measured median x1.23 under floor x1.59); a single
# outlier sample moves exactly one, leaving the median ~1.0.
FLOOR_SHIFT_THRESHOLD = 1.25
FLOOR_SHIFT_MARGIN = 1.3
# sub-second lines jitter past 15% on min-of-5 sampling alone (measured:
# two same-code r16 runs moved embedding_knn_bruteforce +17% and
# rsi_14_1h +17% under flat brackets) — a move must ALSO clear this
# absolute floor before it can be called REAL
ABS_FLOOR_SEC = 0.25

# Which canary bursts bracket which bench block. Labels are the
# canary_burst() call sites in bench.py; _require_block_labels errors if
# a current record lacks one (a malformed/edited record must not thin a
# block's brackets silently — ADVICE r16 #3).
_BLOCK_BRACKETS = {
    "candle_chain_cold": ("pre_cold", "post_chain_cold"),
    "candle_cache_cold": ("post_chain_cold", "post_cache_cold"),
    "kmeans_train_cold": ("post_cache_cold", "post_train_cold"),
    "ivf_index_build_cold": ("post_train_cold", "post_index_cold"),
    # r17 text-index cold lines run together between these two bursts
    "lsh_bands_build_cold": ("post_index_cold", "post_text_index_cold"),
    "exsub_positions_build_cold": ("post_index_cold", "post_text_index_cold"),
    "bloom_build_cold": ("post_index_cold", "post_text_index_cold"),
    "events_scan_full": ("_last_headline", "post_pruning_lines"),
    "events_scan_pruned_3d": ("_last_headline", "post_pruning_lines"),
    "join_orderkey_bucketed": ("post_pruning_lines", "post_bucket_lines"),
    "join_orderkey_shuffled": ("post_pruning_lines", "post_bucket_lines"),
    "skew_join_agg_naive": ("post_bucket_lines", "post_skew_lines"),
    "skew_join_agg_salted": ("post_bucket_lines", "post_skew_lines"),
}
_HEADLINE_PREFIX = "post_headline_round_"


def _burst_mins(detail: dict) -> dict[str, float]:
    bursts = detail.get("host_canary", {}).get("cpu_codegen_bursts", [])
    return {b["at"]: b["min_sec"] for b in bursts}


def _canary_floor(detail: dict) -> float | None:
    """Run-wide fixed-work canary floor: the quietest cpu-probe moment of
    the whole run (cpu_codegen_run_floor_sec, r17+; min over the burst
    series for r16 records). The floor RATIO between two records measures
    relative host speed independent of any query — fixed work, best case,
    so external load can only raise it."""
    hc = detail.get("host_canary", {})
    if hc.get("cpu_codegen_run_floor_sec"):
        return hc["cpu_codegen_run_floor_sec"]
    bursts = hc.get("cpu_codegen_bursts", [])
    return min((b["min_sec"] for b in bursts), default=None)


def _median_burst_ratio(
    cur_bursts: dict[str, float], prev_bursts: dict[str, float]
) -> float | None:
    """Median of the position-wise cpu-burst ratios over common labels —
    the 'did MOST of the run move' corroboration for the floor-shift
    rule. None when the records share no labeled bursts."""
    import statistics

    ratios = [
        cur_bursts[k] / prev_bursts[k]
        for k in cur_bursts
        if prev_bursts.get(k)
    ]
    return statistics.median(ratios) if ratios else None


def _burst_io_firsts(detail: dict) -> dict[str, float]:
    """Per-burst page-cache canary FIRST-read times (the eviction-sensitive
    statistic — later reads re-warm the cache; see bench.canary_burst).
    Empty for pre-r18 records, which predate the io series."""
    bursts = detail.get("host_canary", {}).get("cpu_codegen_bursts", [])
    return {b["at"]: b["io_first_sec"] for b in bursts if "io_first_sec" in b}


def _io_bracket_excuses(
    name: str,
    delta: float,
    cur_io: dict[str, float],
    prev_io: dict[str, float],
    cpu_bursts: dict[str, float],
) -> bool | None:
    """IO (page-cache) excusal for this line's move; None when either
    record lacks the io series (rule cannot run — cpu rule still applies,
    so this is NOT an INDETERMINATE condition).

    A bracket is io-loaded in a direction iff its io_first_sec moved that
    way past BOTH the 3x relative threshold and the 0.05 s absolute floor
    (warm jitter <= 2x / ~0.005 s can never qualify; eviction is 43x /
    +0.25 s). Same structure as the cpu rule: block lines excuse on ANY
    bracket, headline regressions only if EVERY round bracket is loaded
    (min-of-N needs only one quiet round), headline improvements on ANY."""
    keys = [k for k in _bracket_keys(name, cpu_bursts) if k in cur_io]
    pairs = [(cur_io[k], prev_io[k]) for k in keys if prev_io.get(k)]
    if not pairs:
        return None

    def _risen(c: float, p: float) -> bool:
        return c / p >= IO_LOAD_THRESHOLD and c - p >= IO_ABS_FLOOR_SEC

    def _dropped(c: float, p: float) -> bool:
        return p / c >= IO_LOAD_THRESHOLD and p - c >= IO_ABS_FLOOR_SEC

    is_headline = name not in _BLOCK_BRACKETS
    if delta >= 0:
        flags = [_risen(c, p) for c, p in pairs]
        return all(flags) if is_headline else any(flags)
    return any(_dropped(c, p) for c, p in pairs)


def _headline_labels(bursts: dict[str, float]) -> list[str]:
    """Headline-round burst labels PRESENT in the record — derived, not
    hardcoded to bench.py's current N_RUNS (ADVICE r16 #3: a hardcoded
    range(1, 6) would silently vanish if the round count changed)."""
    return sorted(
        (k for k in bursts if k.startswith(_HEADLINE_PREFIX)),
        key=lambda k: int(k[len(_HEADLINE_PREFIX):]),
    )


def _bracket_keys(name: str, bursts: dict[str, float]) -> list[str]:
    headline = _headline_labels(bursts)
    if name not in _BLOCK_BRACKETS:
        return headline
    keys = []
    for k in _BLOCK_BRACKETS[name]:
        if k == "_last_headline":
            # the pruning block opens where the last headline round ends
            keys.append(headline[-1] if headline else k)
        else:
            keys.append(k)
    return keys


def _require_block_labels(
    cur_bursts: dict[str, float], cur_lines: dict
) -> None:
    """Error on expected-but-missing brackets in the CURRENT record: the
    current run is produced by this repo's bench.py, so every block label
    must be present — thinning would quietly widen/weaken brackets. Only
    brackets of blocks whose LINE the record carries are required, so a
    record frozen before a block existed (e.g. the pre-text-index r17
    fixtures) stays adjudicable as a current record."""
    if not _headline_labels(cur_bursts):
        raise SystemExit(
            "current record has no post_headline_round_* bursts — "
            "malformed BENCH_DETAIL"
        )
    missing = {
        k
        for line, pair in _BLOCK_BRACKETS.items()
        if line in cur_lines
        for k in pair
        if k != "_last_headline" and k not in cur_bursts
    }
    if missing:
        raise SystemExit(
            f"current record is missing block bracket bursts {sorted(missing)}"
            " — malformed BENCH_DETAIL (bench.py emits every label)"
        )


def _bracket_ratio(
    name: str,
    delta: float,
    cur_bursts: dict[str, float],
    prev_bursts: dict[str, float],
) -> float | None:
    """Position-wise bracketing-burst movement for this line's block, in
    the DIRECTION of the line's move; None when the previous record
    carries no same-labeled bursts (pre-r16 → INDETERMINATE upstream).

    Block lines: the ANY-bracket rule, direction-aware — a regression
    compares against the most-RISEN bracket (load arriving mid-block
    moves only one bracket), an improvement against the most-DROPPED one
    (load draining mid-block likewise). The r16 version took max(pairs)
    for both directions, which read a one-bracket drop as flat for
    improvements (over-claiming wins).

    Headline lines: the LEAST-moved round in the move's direction —
    min-of-N needs only one quiet round, so a regression is excused only
    if every round rose, an improvement only if some round dropped."""
    keys = [k for k in _bracket_keys(name, cur_bursts) if k in cur_bursts]
    if not keys or not prev_bursts:
        return None
    pairs = [
        cur_bursts[k] / prev_bursts[k] for k in keys if prev_bursts.get(k)
    ]
    if not pairs:
        return None
    is_headline = name not in _BLOCK_BRACKETS
    if delta >= 0:
        # slower line: excusable iff brackets ROSE — any for blocks,
        # all-rounds (i.e. the least-risen) for headline
        return min(pairs) if is_headline else max(pairs)
    # faster line: excusable iff brackets DROPPED — any-bracket both ways
    return min(pairs)


def adjudicate(prev: dict, cur: dict) -> list[dict]:
    if "queries_min" not in prev:
        raise SystemExit(
            "previous record has no queries_min — not a BENCH_DETAIL "
            "payload (the historical BENCH_r06-r08 driver artifacts hold "
            "no parsed totals; pass a committed BENCH_DETAIL.json)"
        )
    if "queries_min" not in cur:
        raise SystemExit(
            "current record has no queries_min — not a BENCH_DETAIL payload"
        )
    prev_min = prev["queries_min"]
    cur_min = cur["queries_min"]
    bursts = _burst_mins(cur)
    prev_bursts = _burst_mins(prev)
    cur_io = _burst_io_firsts(cur)
    prev_io = _burst_io_firsts(prev)
    pf, cf = _canary_floor(prev), _canary_floor(cur)
    floor_ratio = cf / pf if pf and cf else None
    median_ratio = _median_burst_ratio(bursts, prev_bursts)
    # sustained = floor moved >= 25% AND the median position-wise burst
    # ratio corroborates in the same direction (>= the 15% load
    # threshold) — a single outlier sample in either record moves the
    # floor but not the median (see the constants note)
    shifted = (
        floor_ratio is not None
        and median_ratio is not None
        and (
            (
                floor_ratio >= FLOOR_SHIFT_THRESHOLD
                and median_ratio >= LOAD_THRESHOLD
            )
            or (
                floor_ratio <= 1 / FLOOR_SHIFT_THRESHOLD
                and median_ratio <= 1 / LOAD_THRESHOLD
            )
        )
    )
    if not bursts:
        raise SystemExit(
            "current record has no cpu_codegen_bursts — run the r16+ bench"
        )
    _require_block_labels(bursts, cur_min)
    rows = []
    for name in sorted(cur_min):
        cm = cur_min[name]
        pm = prev_min.get(name)
        if pm is None or pm == 0:
            rows.append({"line": name, "cur": cm, "verdict": "NO-BASELINE"})
            continue
        delta = cm / pm - 1.0
        ratio = _bracket_ratio(name, delta, bursts, prev_bursts)
        io_excused = _io_bracket_excuses(name, delta, cur_io, prev_io, bursts)
        # loaded iff the brackets moved past the threshold in the SAME
        # direction as the line (slower line under risen brackets, or
        # faster line under dropped brackets = host, not engine) — by the
        # cpu rule OR the page-cache io rule (each sees a pressure class
        # the other is blind to)
        loaded = (
            ratio is not None
            and (
                (delta > 0 and ratio >= LOAD_THRESHOLD)
                or (delta < 0 and ratio <= 1 / LOAD_THRESHOLD)
            )
        ) or bool(io_excused)
        if abs(delta) < MOVE_THRESHOLD or abs(cm - pm) < ABS_FLOOR_SEC:
            verdict = "FLAT"
        elif ratio is None:
            # no same-labeled prior bursts (pre-r16 record): the bracket
            # rule CANNOT run — never silently pass a big move (ADVICE
            # r16 #1: the old within-run-floor fallback read every
            # pre-r16 bracket at 1.3-3.4x and excused any regression)
            verdict = "INDETERMINATE"
        elif loaded:
            verdict = "LOAD"
        else:
            verdict = "REAL"
        if verdict == "REAL" and shifted:
            # sustained host-speed shift: demote a REAL that moved WITH
            # the floor and within its envelope; a move past even the
            # shifted envelope is an engine move on top of the shift
            line_ratio = cm / pm
            if floor_ratio > 1 and delta > 0 and (
                line_ratio <= floor_ratio * FLOOR_SHIFT_MARGIN
            ):
                verdict = "HOST-SHIFT"
            elif floor_ratio < 1 and delta < 0 and (
                line_ratio >= floor_ratio / FLOOR_SHIFT_MARGIN
            ):
                verdict = "HOST-SHIFT"
        rows.append(
            {
                "line": name,
                "prev": pm,
                "cur": cm,
                "delta_pct": round(delta * 100, 1),
                "bracket_ratio": round(ratio, 3) if ratio else None,
                # True = io brackets excuse the move; False = io series
                # present and flat; None = a record predates the io series
                "io_excused": io_excused,
                "verdict": verdict,
            }
        )
    return rows


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(sys.argv[1]) as f:
        prev = json.load(f)
    cur_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, "BENCH_DETAIL.json"
    )
    with open(cur_path) as f:
        cur = json.load(f)
    rows = adjudicate(prev, cur)
    pf, cf = _canary_floor(prev), _canary_floor(cur)
    if pf and cf:
        med = _median_burst_ratio(_burst_mins(cur), _burst_mins(prev))
        med_s = f"x{med:.3f}" if med is not None else "n/a"
        print(
            f"canary floor {pf:.3f} -> {cf:.3f} (x{cf / pf:.3f}; median "
            f"burst {med_s}; host-shift needs floor x{FLOOR_SHIFT_THRESHOLD}"
            f" + median x{LOAD_THRESHOLD})"
        )
    real_regression = False
    indeterminate_regression = False
    host_shifted = False
    for r in rows:
        if r["verdict"] == "NO-BASELINE":
            print(f'{r["line"]:32s} cur={r["cur"]:8.3f}  NO-BASELINE')
            continue
        io_tag = {True: " io:LOADED", False: " io:flat", None: ""}[
            r["io_excused"]
        ]
        print(
            f'{r["line"]:32s} {r["prev"]:8.3f} -> {r["cur"]:8.3f} '
            f'({r["delta_pct"]:+6.1f}%)  bracket x{r["bracket_ratio"]}'
            f'{io_tag}  {r["verdict"]}'
        )
        if r["verdict"] == "HOST-SHIFT":
            # either direction: a demoted regression AND an un-claimable
            # improvement both require the shift documented (r17
            # self-review: exiting 0 on a faster host would silently
            # re-baseline without the mandated round-notes entry)
            host_shifted = True
        if r["delta_pct"] > 0:
            if r["verdict"] == "REAL":
                real_regression = True
            elif r["verdict"] == "INDETERMINATE":
                indeterminate_regression = True
    if real_regression:
        sys.exit(1)
    if indeterminate_regression:
        print(
            "NOTE: regression(s) with NO bracket baseline (pre-r16 prev "
            "record) — re-run against a committed BENCH_DETAIL with bursts"
        )
        sys.exit(2)
    if host_shifted:
        print(
            "NOTE: the fixed-work canary floor moved >= 25% (median "
            "burst corroborating) between the records — the host itself "
            "changed speed (reboot/migration/sustained throttle), so "
            "line-level deltas within the shifted envelope are host "
            "attribution, not engine moves (improvements included: they "
            "are not wins). Ship only with the shift documented in the "
            "round notes; the next same-host round re-baselines "
            "automatically."
        )
        sys.exit(3)
    sys.exit(0)


if __name__ == "__main__":
    main()
