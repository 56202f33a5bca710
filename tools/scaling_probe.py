"""Multi-point scaling probe (VERDICT r9 task #5, r10 task #5): sf0.1 ->
10x wall-time ratios for the five most expensive operator families — plus a
THIRD, 100x-documents point for the two probes whose cost is visibly
data-proportional (dedup_minhash_lsh, dedup_exact_substring), so a
two-segment slope separates fixed overhead from marginal per-row cost —
recorded as the ``scaling`` block in BENCH_DETAIL.json (bench.py carries
the block forward on subsequent rewrites, keyed by the provenance stamp
written here).

The 10x "sf1-equivalent" fixture is synthesized ONCE into
/tmp/spark_graft_scaling/sf1 from the sf0.1 parquet — only the three
tables the probed queries read:

- events   x10 as LONGER HISTORY: copy k shifts ts by k*(span+1h) and
  offsets event_id; user_id (the currency-pair key) is unchanged, so
  per-window tick density and key cardinality stay constant while history
  grows — the way a real trading feed scales.
- documents x10 with every token suffixed by a copy tag, so shingle sets
  are DISJOINT across copies: each copy preserves the original's near-dup
  structure exactly and total LSH candidate pairs scale ~10x (identical
  copies would instead inflate pairs ~45x and fake super-linearity).
- embeddings x10 with per-copy vec_id offsets and a tiny deterministic
  scale perturbation; copy 0 keeps the original ids so the probed query
  sample (vec_id < 16) stays 16 queries while the corpus grows 10x —
  matching how an ANN serving corpus scales.

Protocol mirrors bench.py's headline lines: per scale, one untimed
warm-up run populates the session caches (candle chain, shingle relation,
trained codebook), then N timed runs; compare MINIMA (load noise only
adds time). Near-linear ratios (~10x on the 10x tables) validate the
banded/bucketed/windowed plan-shape claims; super-linear ratios localize
the next bottleneck.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_DIR = "/tmp/spark_graft_scaling/sf1"
DOCS100_DIR = "/tmp/spark_graft_scaling/docs100"
PART10_DIR = "/tmp/spark_graft_scaling/part10"
PART100_DIR = "/tmp/spark_graft_scaling/part100"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
DOC_COPIES_100 = 100
N_RUNS = 3
# Bump when fixture CONSTRUCTION changes; stamped into each fixture's
# completion marker. A missing/mismatched marker forces a rebuild — without
# it a stale or interrupted build (the dir exists before the writes finish)
# would be silently reused and skew the recorded ratios (ADVICE r10).
FIXTURE_VERSION = "v2"
DOC_PROBES_100X = [
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    # r11: the incremental gate rides the same fixture — comparing its
    # line against dedup_minhash_lsh at the same point quantifies the
    # batch-vs-corpus claim (cross-split candidates + top-1 election
    # should stay strictly under the all-pairs pass at every scale)
    "dedup_incremental_minhash",
    # r12: the STREAMING twin of the incremental probe — same fixture
    # split, same banded probe per micro-batch (2 batches + a full
    # replay drain per call). Its line minus dedup_incremental_minhash's
    # at the same point measures the fixed streaming machinery overhead;
    # tracking both claims the gate's corpus-scaling IS the batch
    # probe's (the warm-up builds the shared corpus index once; timed
    # runs measure feed write + two drains + sink read).
    "streaming_ingest_dedup_gate",
]
PROBES = [
    "dedup_minhash_lsh",
    "embedding_knn_ivf_kmeans",
    "event_asof_tick",
    # r10 extension: the two heaviest documents-table bench lines — the
    # positions-kept shingle pipeline (two key shuffles) and the
    # Zipf-skew-guarded TF-IDF pre-agg
    "dedup_exact_substring",
    "text_tfidf_top_terms",
    # r11: incremental batch-vs-corpus dedup (see DOC_PROBES_100X note)
    "dedup_incremental_minhash",
    # r12: its streaming twin (see DOC_PROBES_100X note)
    "streaming_ingest_dedup_gate",
]


def _marker_path(d: str) -> str:
    return os.path.join(d, "_FIXTURE_COMPLETE")


def _marker_value(copies: int) -> str:
    return f"{FIXTURE_VERSION}:{copies}x:{SRC_DIR}"


def _fixture_ok(d: str, copies: int) -> bool:
    try:
        with open(_marker_path(d)) as f:
            return f.read() == _marker_value(copies)
    except OSError:
        return False


def _salted_documents(spark, copies: int, out_dir: str) -> None:
    """documents x ``copies`` with every token suffixed by a copy tag, so
    shingle sets are DISJOINT across copies: each copy preserves the
    original's near-dup structure exactly and total LSH candidate pairs
    scale ~linearly (identical copies would inflate pairs quadratically
    and fake super-linearity)."""
    from pyspark.sql import functions as F

    doc = spark.read.parquet(f"{SRC_DIR}/documents.parquet")
    parts = [
        doc.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(x, F.lit(f"~c{k}")),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


# r15 (VERDICT r14 task #1 evidence): the entity-resolution probe — the
# part table x {10,100} with every NAME TOKEN suffixed by a copy tag, so
# the vocabulary grows xN while every block keeps its original density
# (each token still appears in exactly 8 distinct names). This is the
# regime the hardened rarest-K blocking claims LINEAR candidate scaling
# in distinct names; near-linear measured ratios certify it. (The other
# regime — names xN under a FIXED vocabulary — grows blocks xN and
# candidates xN², but there the TRUE near-dup pairs also grow xN²
# [copies of one original are genuine near-duplicates], so the quadratic
# work is information-theoretically required and is the documented
# closed-vocabulary degeneracy in the operator's docstring contract.)
PART_PROBES = ["part_name_fuzzy_match"]


def _salted_part(spark, copies: int, out_dir: str) -> None:
    """part x ``copies`` with every p_name token copy-tag-suffixed:
    vocabulary and distinct names scale xN while per-token block
    membership is UNCHANGED. Cross-copy name pairs share no token, so
    they fall OUTSIDE the operator's shared-token blocking contract
    (some are nonetheless within 3 edits — `~c3` vs `~c7` is one
    substitution per token — the exact recall/cost tradeoff the
    docstring states); the CONTRACTED answer and the candidate set
    therefore both scale exactly xN, which is what this probe times."""
    from pyspark.sql import functions as F

    part = spark.read.parquet(f"{SRC_DIR}/part.parquet")
    parts = [
        part.select(
            (F.col("p_partkey") + F.lit(k * 10_000_000)).alias("p_partkey"),
            F.array_join(
                F.transform(
                    F.split(F.col("p_name"), " "),
                    lambda x: F.concat(x, F.lit(f"~c{k}")),
                ),
                " ",
            ).alias("p_name"),
            *[c for c in part.columns if c not in ("p_partkey", "p_name")],
        )
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(16).write.mode("overwrite").parquet(f"{out_dir}/part.parquet")


# r16 (VERDICT r15 task #5): the CLOSED-VOCABULARY leg — the r15 probe's
# token-salting grows the vocabulary xN (constant block density, the
# favorable linear regime), so the docstring's degeneracy warning was
# measured only at fixture scale. This leg holds the vocabulary FIXED at
# the fixture's 16 tokens and grows DISTINCT NAMES x10/x100 (4-token
# names, stride-sampled permutations so token frequencies stay
# near-uniform — the exact worst case). Block membership grows xN, so
# blocked GENERATION grows ~xN² by construction; the claim under test is
# that the provable length+bag filters keep the rows entering the
# expensive distinct+DP stages NEAR THE TRUE PAIRS at every scale. Counts
# are measured against the shipped key derivation
# (analytics._fuzzy_blocked_keyed) and the shipped pipeline; global truth
# is an exact all-pairs levenshtein (affordable at 6400 names: 20.5M
# pairs, one Spark job, probe-only cost).
CLOSED_VOCAB_SCALES = [64, 640, 6400]
# The assertions the leg exists to pin, with measured headroom. r16 first
# measurement (length+bag filters only): generated/all-pairs
# 0.31/0.36/0.35 (blocked generation IS a constant fraction of N² in the
# uniform regime — the documented degeneracy), filtered/generated
# 0.029/0.033/0.037, BUT filtered/true = 153x at 640 / 52x at 6400:
# permutation-dense names share character BAGS, so the bag bound was weak
# exactly here. r17 (VERDICT r16 task #2) added the order-aware
# positional-bigram bound to the chain: measured filtered/generated
# 0.000/0.0002/0.0016, filtered/all-pairs 0.000/0.0001/0.0006, and
# filtered/true 1.12x at 640 / 2.24x at 6400 — the DP now runs
# essentially on the true pairs even in the anagram worst case (the r16
# verdict's target was ≤20x). Pins keep ~3x headroom over the measured
# worst scale.
CLOSED_VOCAB_FILTERED_OVER_GENERATED_MAX = 0.005
CLOSED_VOCAB_FILTERED_OVER_ALLPAIRS_MAX = 0.002
# DP-input density vs the exact truth (the r16 verdict's ≤20x target,
# beaten 9x): only meaningful where the fixture holds true pairs.
CLOSED_VOCAB_FILTERED_OVER_TRUE_MAX = 5.0
# Blocking-recall floor (VERDICT r16 task #3): the measured anagram-
# regime recall is 0.8125 at 640 names (13/16; EVERY miss verified below
# to satisfy the documented disjoint-rarest-K condition) and 0.9815 at
# 6400 — the floor pins the 640-name worst case with a little slack for
# fixture drift, and the per-miss check keeps the accepted loss honest:
# a miss OUTSIDE the stated condition fails the leg regardless of the
# aggregate recall.
CLOSED_VOCAB_BLOCKING_RECALL_FLOOR = 0.78


def _closed_vocab_names(n: int) -> list[str]:
    import itertools

    colors = ["blue", "cold", "hot", "misty", "plum", "red", "warm", "dark"]
    objects = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
               "widget"]
    vocab = colors + objects
    perms = list(itertools.permutations(vocab, 4))  # 43,680 — enumerable
    stride = len(perms) // n
    names = [" ".join(p) for p in perms[::stride][:n]]
    assert len(names) == n and len(set(names)) == n
    return names


def closed_vocab_er_block(spark) -> dict:
    from pyspark.sql import functions as F

    from trading_etl_spark.queries import analytics

    out = {}
    for n in CLOSED_VOCAB_SCALES:
        names = _closed_vocab_names(n)
        parts = spark.createDataFrame([(nm,) for nm in names],
                                      "p_name string").repartition(8)
        toks = analytics._name_token_relation(parts).persist()
        key_rows = toks.count()  # same measured gate the operator runs
        keyed = analytics._fuzzy_blocked_keyed(toks, key_rows)
        a = keyed.select(F.col("p_name").alias("name_a"), "blk")
        b = keyed.select(F.col("p_name").alias("name_b"), "blk")
        cand = a.join(b, "blk").filter(F.col("name_a") < F.col("name_b"))
        generated = cand.select("name_a", "name_b").distinct().count()
        # the SHIPPED filter chain (length → bag → positional bigrams),
        # via the shared helper — ADVICE r16: the probe hand-copied the
        # filter expressions, so a change to the shipped filters would
        # have silently decoupled the pinned ratios from the shipped code
        filtered = (
            analytics._apply_lev_lb_filters(cand)
            .select("name_a", "name_b")
            .distinct()
            .count()
        )
        contract_pairs = {
            (r["name_a"], r["name_b"])
            for r in analytics._fuzzy_match_pairs(toks, key_rows)
            .select("name_a", "name_b")
            .collect()
        }
        contract_true = len(contract_pairs)
        nm = parts.select(F.col("p_name").alias("x"))
        # exact truth as a SET (not just a count) so every blocking miss
        # can be verified against the documented disjoint-rarest-K
        # condition below (VERDICT r16 task #3); true pairs are ≤ ~5k
        # rows at the largest scale — collect is probe-only and bounded
        global_true_pairs = {
            (r["x"], r["y"])
            for r in nm.crossJoin(nm.select(F.col("x").alias("y")))
            .filter(F.col("x") < F.col("y"))
            .filter(
                F.levenshtein("x", "y", analytics.FUZZY_MAX_DIST) >= 0
            )
            .collect()
        }
        global_true = len(global_true_pairs)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            analytics._fuzzy_match_pairs(toks, key_rows).write.format(
                "noop"
            ).mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        toks.unpersist()
        allp = n * (n - 1) // 2
        entry = {
            "n_names": n,
            "all_pairs": allp,
            "generated_candidates": generated,
            "filtered_candidates": filtered,
            "contract_true_pairs": contract_true,
            "global_true_pairs": global_true,
            "generated_over_allpairs": round(generated / allp, 4),
            "filtered_over_generated": (
                round(filtered / generated, 4) if generated else None
            ),
            "filtered_over_allpairs": round(filtered / allp, 4),
            "filtered_over_true": (
                round(filtered / global_true, 2) if global_true else None
            ),
            "blocking_recall": (
                round(contract_true / global_true, 4) if global_true else None
            ),
            "wall_runs_sec": runs,
            "wall_min_sec": min(runs),
        }
        # a degenerate vocabulary (zero blocked generation) must fail with
        # ITS OWN message, not a ZeroDivisionError inside the ratio pins
        assert generated > 0, (
            f"closed-vocab {n} names: blocking generated ZERO candidate "
            "pairs — the fixture no longer exercises the dense regime"
        )
        assert (
            filtered / generated <= CLOSED_VOCAB_FILTERED_OVER_GENERATED_MAX
        ), (
            f"closed-vocab {n} names: filtered/generated = "
            f"{filtered / generated:.3f} breached the "
            f"{CLOSED_VOCAB_FILTERED_OVER_GENERATED_MAX} pin — the provable "
            "filters lost their >95% cut of the blocked generation"
        )
        assert (
            filtered / allp <= CLOSED_VOCAB_FILTERED_OVER_ALLPAIRS_MAX
        ), (
            f"closed-vocab {n} names: filtered/all-pairs = "
            f"{filtered / allp:.4f} breached the "
            f"{CLOSED_VOCAB_FILTERED_OVER_ALLPAIRS_MAX} pin — the "
            "distinct+DP stages no longer run well under the naive square"
        )
        if global_true:
            assert (
                filtered / global_true <= CLOSED_VOCAB_FILTERED_OVER_TRUE_MAX
            ), (
                f"closed-vocab {n} names: filtered/true = "
                f"{filtered / global_true:.2f} breached the "
                f"{CLOSED_VOCAB_FILTERED_OVER_TRUE_MAX} pin — the DP input "
                "is no longer near the true pairs (did the positional "
                "bigram bound fall out of the chain?)"
            )
            # recall floor + per-miss honesty (VERDICT r16 task #3): every
            # missed true pair must satisfy the DOCUMENTED loss condition —
            # its rarest-K key sets are disjoint — recomputed here with the
            # operator's own key rule (frequency over distinct names, token
            # tie-break). A miss outside the condition is a blocking BUG,
            # not the accepted tradeoff, and fails the leg regardless of
            # the aggregate recall.
            recall = contract_true / global_true
            assert recall >= CLOSED_VOCAB_BLOCKING_RECALL_FLOOR, (
                f"closed-vocab {n} names: blocking recall {recall:.4f} fell "
                f"below the {CLOSED_VOCAB_BLOCKING_RECALL_FLOOR} floor"
            )
            freq: dict = {}
            for name in names:
                for t in set(name.split(" ")):
                    freq[t] = freq.get(t, 0) + 1

            def _rarest_k(name: str) -> set:
                return set(
                    sorted(
                        set(name.split(" ")), key=lambda t: (freq[t], t)
                    )[: analytics.FUZZY_BLOCK_K]
                )

            unmissable = contract_pairs - global_true_pairs
            assert not unmissable, (
                f"contract returned pairs outside the exact truth: "
                f"{sorted(unmissable)[:3]}"
            )
            for x, y in sorted(global_true_pairs - contract_pairs):
                assert not (_rarest_k(x) & _rarest_k(y)), (
                    f"closed-vocab {n} names: missed true pair ({x!r}, "
                    f"{y!r}) SHARES a rarest-K key — a blocking bug, not "
                    "the documented disjoint-rarest-K loss"
                )
        out[f"names_{n}"] = entry
    return out


def build_part_fixture(spark, copies: int, out_dir: str) -> None:
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    _salted_part(spark, copies, out_dir)
    with open(_marker_path(out_dir), "w") as f:
        f.write(_marker_value(copies))


def build_docs100_fixture(spark) -> None:
    if os.path.isdir(DOCS100_DIR):
        shutil.rmtree(DOCS100_DIR)
    os.makedirs(DOCS100_DIR, exist_ok=True)
    _salted_documents(spark, DOC_COPIES_100, DOCS100_DIR)
    with open(_marker_path(DOCS100_DIR), "w") as f:
        f.write(_marker_value(DOC_COPIES_100))


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(FIXTURE_DIR):
        shutil.rmtree(FIXTURE_DIR)
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    ev = spark.read.parquet(f"{SRC_DIR}/events.parquet")
    bounds = ev.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    span_sec = int((bounds["hi"] - bounds["lo"]).total_seconds()) + 3600
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(k * 10_000_000)).alias("event_id"),
            (F.col("ts") + F.expr(f"INTERVAL {k * span_sec} SECONDS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        for k in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{FIXTURE_DIR}/events.parquet")

    _salted_documents(spark, COPIES, FIXTURE_DIR)

    emb = spark.read.parquet(f"{SRC_DIR}/embeddings.parquet")
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(k * 10_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x: (x * F.lit(float(1.0 + k * 1e-4))).cast("float"),
            ).alias("embedding"),
            "label",
        )
        for k in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(8).write.mode("overwrite").parquet(
        f"{FIXTURE_DIR}/embeddings.parquet"
    )
    with open(_marker_path(FIXTURE_DIR), "w") as f:
        f.write(_marker_value(COPIES))


def time_probes(spark, queries, sf_dir: str,
                probes: list[str] | None = None) -> dict[str, list[float]]:
    out: dict[str, list[float]] = {}
    for name in probes if probes is not None else PROBES:
        fn = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
    return out


def main() -> None:
    from trading_etl_spark.registry import build_queries
    from trading_etl_spark.session import get_spark

    spark = get_spark("scaling_probe")
    queries = build_queries()

    if not _fixture_ok(FIXTURE_DIR, COPIES):
        print("building 10x fixture ...", flush=True)
        build_fixture(spark)
    if not _fixture_ok(DOCS100_DIR, DOC_COPIES_100):
        print("building 100x documents fixture ...", flush=True)
        build_docs100_fixture(spark)
    if not _fixture_ok(PART10_DIR, COPIES):
        print("building 10x part-names fixture ...", flush=True)
        build_part_fixture(spark, COPIES, PART10_DIR)
    if not _fixture_ok(PART100_DIR, DOC_COPIES_100):
        print("building 100x part-names fixture ...", flush=True)
        build_part_fixture(spark, DOC_COPIES_100, PART100_DIR)

    base = time_probes(spark, queries, SRC_DIR)
    big = time_probes(spark, queries, FIXTURE_DIR)
    huge = time_probes(spark, queries, DOCS100_DIR, probes=DOC_PROBES_100X)
    er_base = time_probes(spark, queries, SRC_DIR, probes=PART_PROBES)
    er_10 = time_probes(spark, queries, PART10_DIR, probes=PART_PROBES)
    er_100 = time_probes(spark, queries, PART100_DIR, probes=PART_PROBES)
    closed_vocab = closed_vocab_er_block(spark)
    spark.stop()

    import subprocess
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except (OSError, subprocess.CalledProcessError):
        commit = "unknown"
    block = {
        "fixture": f"{COPIES}x sf0.1 (events longer-history, documents "
        "token-salted disjoint shingles, embeddings corpus-only growth); "
        f"{DOC_COPIES_100}x documents third point for {DOC_PROBES_100X}",
        "fixture_version": FIXTURE_VERSION,
        # provenance (ADVICE r10): the commit whose query implementations
        # these ratios measured, so bench.py's carry-forward is visibly
        # stale once the probed operators change.
        "measured_commit": commit,
        "measured_at_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "runs_per_point": N_RUNS,
        "queries": {},
    }
    for name in PROBES:
        lo, hi = min(base[name]), min(big[name])
        entry = {
            "sf0.1_min_sec": lo,
            "sf1_min_sec": hi,
            "sf0.1_runs": base[name],
            "sf1_runs": big[name],
            "ratio_min": round(hi / lo, 2) if lo else None,
            "median_ratio": round(
                statistics.median(big[name]) / statistics.median(base[name]), 2
            ),
        }
        if name in huge:
            xl = min(huge[name])
            entry["docs100_min_sec"] = xl
            entry["docs100_runs"] = huge[name]
            entry["ratio_100x_min"] = round(xl / lo, 2) if lo else None
            # two-segment marginal slope (sec per 1x of documents): the
            # 1x->10x segment is overhead-dominated at this scale; the
            # 10x->100x segment isolates the per-row marginal cost.
            entry["marginal_sec_per_copy_1_10"] = round((hi - lo) / 9, 3)
            entry["marginal_sec_per_copy_10_100"] = round(
                (xl - hi) / (DOC_COPIES_100 - COPIES), 3
            )
        block["queries"][name] = entry

    for name in PART_PROBES:
        lo, hi, xl = min(er_base[name]), min(er_10[name]), min(er_100[name])
        block["queries"][name] = {
            "fixture": "part-names x10/x100, token-salted (vocabulary grows,"
            " block density constant — the linear regime the rarest-K"
            " blocking claims; see PART_PROBES note)",
            "names1x_min_sec": lo,
            "names10x_min_sec": hi,
            "names100x_min_sec": xl,
            "names1x_runs": er_base[name],
            "names10x_runs": er_10[name],
            "names100x_runs": er_100[name],
            "ratio_10x_min": round(hi / lo, 2) if lo else None,
            "ratio_100x_min": round(xl / lo, 2) if lo else None,
            "marginal_sec_per_copy_10_100": round(
                (xl - hi) / (DOC_COPIES_100 - COPIES), 3
            ),
        }

    block["queries"]["part_name_fuzzy_match_closed_vocab"] = {
        "fixture": "FIXED 16-token vocabulary, distinct 4-token names"
        " x10/x100 (stride-sampled permutations, near-uniform token"
        " frequencies — the degenerate regime the operator docstring"
        " warns about; see CLOSED_VOCAB note)",
        "filtered_over_generated_pin": CLOSED_VOCAB_FILTERED_OVER_GENERATED_MAX,
        "filtered_over_allpairs_pin": CLOSED_VOCAB_FILTERED_OVER_ALLPAIRS_MAX,
        **closed_vocab,
    }

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    detail = {}
    if os.path.exists(detail_path):
        with open(detail_path) as f:
            detail = json.load(f)
    detail["scaling"] = block
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(json.dumps(block, indent=1))


if __name__ == "__main__":
    main()
