"""Mechanical bench adjudication (VERDICT r15 task #2 follow-through):
apply the burst-canary load-attribution rule to two rounds' shipped
records, so "did the engine regress or did the host load move?" is
decidable from the committed artifacts alone — no off-record re-runs.

Rule: a line's move is attributable to HOST LOAD iff the canary bursts
BRACKETING its block moved >= LOAD_THRESHOLD in the SAME direction as the
line, measured POSITION-WISE against the same-labeled bursts of the
previous record; a move under flat brackets is real engine behavior.
Position-wise (not vs the run's own quietest burst) because the JVM
matures over the whole bench run — a fresh canary descends 0.21 -> 0.06
across the run with NO external load (measured r16), so early bursts are
structurally above the end-of-run floor and a within-run floor comparison
would read every cold-block move as LOAD. Comparing burst[i] to burst[i]
of the prior round holds maturation state constant. When the previous
record predates the burst series (pre-r16), the within-run floor
comparison is the fallback.

Usage:
    python tools/adjudicate.py BENCH_DETAIL_prev.json [BENCH_DETAIL_cur.json]

The current record defaults to the repo's BENCH_DETAIL.json. The previous
record must also be a BENCH_DETAIL payload (per-query minima live there;
the compact BENCH_r{N}.json line holds medians). Lines are compared on
MIN per the bench methodology. Output: one row per common line with the
move, its bracketing-burst state in the CURRENT run, and the verdict:

    REAL          moved past both thresholds under flat brackets
    LOAD          moved past both thresholds with brackets moved the
                  same direction
    FLAT          under the relative OR absolute move threshold
    NO-BASELINE   line absent from the previous record

Exit status 1 iff any REAL regression (slower, not faster) is found, so
the round workflow can gate on it.
"""

from __future__ import annotations

import json
import os
import sys

LOAD_THRESHOLD = 1.15  # bracket >= 15% over the run's quietest burst
MOVE_THRESHOLD = 0.15  # |delta| below this needs no adjudication
# sub-second lines jitter past 15% on min-of-5 sampling alone (measured:
# two same-code r16 runs moved embedding_knn_bruteforce +17% and
# rsi_14_1h +17% under flat brackets) — a move must ALSO clear this
# absolute floor before it can be called REAL
ABS_FLOOR_SEC = 0.25

# Which canary bursts bracket which bench block. Headline lines are
# round-interleaved — each line's min can come from ANY round — so their
# bracket set is every headline-round burst (conservative: a single quiet
# round is enough for the min to be a quiet-host number, so headline
# brackets use the QUIETEST headline burst, not the loudest).
_BLOCK_BRACKETS = {
    "candle_chain_cold": ("pre_cold", "post_chain_cold"),
    "candle_cache_cold": ("post_chain_cold", "post_cache_cold"),
    "kmeans_train_cold": ("post_cache_cold", "post_train_cold"),
    "ivf_index_build_cold": ("post_train_cold", "post_index_cold"),
    "events_scan_full": ("post_headline_round_5", "post_pruning_lines"),
    "events_scan_pruned_3d": ("post_headline_round_5", "post_pruning_lines"),
    "join_orderkey_bucketed": ("post_pruning_lines", "post_bucket_lines"),
    "join_orderkey_shuffled": ("post_pruning_lines", "post_bucket_lines"),
    "skew_join_agg_naive": ("post_bucket_lines", "post_skew_lines"),
    "skew_join_agg_salted": ("post_bucket_lines", "post_skew_lines"),
}
_HEADLINE_BURSTS = tuple(f"post_headline_round_{i}" for i in range(1, 6))


def _burst_mins(detail: dict) -> dict[str, float]:
    bursts = detail.get("host_canary", {}).get("cpu_codegen_bursts", [])
    return {b["at"]: b["min_sec"] for b in bursts}


def _bracket_keys(name: str, bursts: dict[str, float]) -> list[str]:
    if name in _BLOCK_BRACKETS:
        return [k for k in _BLOCK_BRACKETS[name] if k in bursts]
    return [k for k in _HEADLINE_BURSTS if k in bursts]


def _bracket_ratio(
    name: str, cur_bursts: dict[str, float], prev_bursts: dict[str, float],
) -> float | None:
    """Bracketing-burst movement for this line's block.

    Position-wise when the previous record carries the burst series:
    worst same-label cur/prev ratio over the block's brackets — except
    headline lines, where the BEST (least-moved) round counts, because
    min-of-5 needs only one quiet round. Fallback (prev record pre-r16):
    worst bracket over the current run's own quietest burst."""
    keys = _bracket_keys(name, cur_bursts)
    if not keys:
        return None
    if prev_bursts:
        pairs = [
            cur_bursts[k] / prev_bursts[k]
            for k in keys
            if prev_bursts.get(k)
        ]
        if not pairs:
            return None
        is_headline = name not in _BLOCK_BRACKETS
        return min(pairs) if is_headline else max(pairs)
    floor = min(cur_bursts.values())
    agg = min if name not in _BLOCK_BRACKETS else max
    return agg(cur_bursts[k] for k in keys) / floor


def adjudicate(prev: dict, cur: dict) -> list[dict]:
    prev_min = prev.get("queries_min", {})
    cur_min = cur.get("queries_min", {})
    bursts = _burst_mins(cur)
    prev_bursts = _burst_mins(prev)
    if not bursts:
        raise SystemExit(
            "current record has no cpu_codegen_bursts — run the r16+ bench"
        )
    rows = []
    for name in sorted(cur_min):
        cm = cur_min[name]
        pm = prev_min.get(name)
        if pm is None or pm == 0:
            rows.append({"line": name, "cur": cm, "verdict": "NO-BASELINE"})
            continue
        delta = cm / pm - 1.0
        ratio = _bracket_ratio(name, bursts, prev_bursts)
        # loaded iff the brackets moved past the threshold in the SAME
        # direction as the line (slower line under slower brackets, or
        # faster line under faster brackets = host, not engine)
        loaded = ratio is not None and (
            (delta > 0 and ratio >= LOAD_THRESHOLD)
            or (delta < 0 and ratio <= 1 / LOAD_THRESHOLD)
        )
        if abs(delta) < MOVE_THRESHOLD or abs(cm - pm) < ABS_FLOOR_SEC:
            verdict = "FLAT"
        elif loaded:
            verdict = "LOAD"
        else:
            verdict = "REAL"
        rows.append(
            {
                "line": name,
                "prev": pm,
                "cur": cm,
                "delta_pct": round(delta * 100, 1),
                "bracket_ratio": round(ratio, 3) if ratio else None,
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
    regressed = False
    for r in rows:
        if r["verdict"] == "NO-BASELINE":
            print(f'{r["line"]:32s} cur={r["cur"]:8.3f}  NO-BASELINE')
            continue
        print(
            f'{r["line"]:32s} {r["prev"]:8.3f} -> {r["cur"]:8.3f} '
            f'({r["delta_pct"]:+6.1f}%)  bracket x{r["bracket_ratio"]}'
            f'  {r["verdict"]}'
        )
        if r["verdict"] == "REAL" and r["delta_pct"] > 0:
            regressed = True
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
