"""Property-based tests (hypothesis) — the reference has none (SURVEY §5);
these pin the algebraic invariants the example-based tests can't sweep.

NumPy indicator kernels get wide random sweeps (no Spark, fast); Spark-side
properties run few examples with a session-scoped fixture."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from trading_etl_spark.operators.indicators import _ema_series, _rsi_series

prices = st.lists(
    st.floats(min_value=0.01, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=0,
    max_size=200,
)
periods = st.integers(min_value=2, max_value=30)


@given(prices, periods)
@settings(max_examples=200, deadline=None)
def test_ema_warmup_and_bounds(xs, period):
    out = _ema_series(np.array(xs, dtype=np.float64), period)
    assert len(out) == len(xs)
    n_nan = int(np.isnan(out).sum())
    if len(xs) < period:
        assert n_nan == len(xs)
    else:
        assert n_nan == period - 1
        valid = out[~np.isnan(out)]
        # EMA is a convex combination of observed prices — never escapes range
        assert valid.min() >= min(xs) - 1e-6
        assert valid.max() <= max(xs) + 1e-6


@given(prices, periods)
@settings(max_examples=200, deadline=None)
def test_rsi_warmup_and_bounds(xs, period):
    out = _rsi_series(np.array(xs, dtype=np.float64), period)
    assert len(out) == len(xs)
    n_nan = int(np.isnan(out).sum())
    if len(xs) <= period:
        assert n_nan == len(xs)
    else:
        assert n_nan == period
        valid = out[~np.isnan(out)]
        assert (valid >= 0.0 - 1e-9).all() and (valid <= 100.0 + 1e-9).all()


@given(st.lists(st.floats(min_value=1, max_value=100, allow_nan=False), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_ema_constant_series_is_constant(xs):
    """EMA of a constant series equals the constant from the seed row on."""
    c = xs[0]
    arr = np.full(len(xs), c)
    out = _ema_series(arr, min(4, len(xs)))
    valid = out[~np.isnan(out)]
    assert np.allclose(valid, c)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=600),  # second offset
            st.floats(min_value=1, max_value=1000, allow_nan=False),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=15, deadline=None)
def test_ohlc_invariants(spark_prop, ticks_raw):
    """For any tick set: low ≤ open/close ≤ high per bucket, and candle
    counts equal distinct minutes."""
    from datetime import datetime, timedelta

    from trading_etl_spark.operators.ohlc import ohlc_base
    from trading_etl_spark.schemas import TICK_SCHEMA

    base_t = datetime(2024, 1, 1, 10, 0, 0)
    seen = set()
    rows = []
    for off, bid in ticks_raw:
        if off in seen:  # respect the 1-second-dedup precondition
            continue
        seen.add(off)
        rows.append(("X/Y", base_t + timedelta(seconds=off), float(bid), float(bid) + 0.1))
    df = spark_prop.createDataFrame(rows, TICK_SCHEMA)
    out = ohlc_base(df).collect()
    minutes = {(r[0], r[1].replace(second=0)) for r in [(p, t) for p, t, _, _ in rows]}
    assert len(out) == len(minutes)
    for r in out:
        assert r["low"] <= min(r["open"], r["close"]) + 1e-9
        assert r["high"] >= max(r["open"], r["close"]) - 1e-9
        assert not math.isnan(r["open"])


# --- as-of twin equivalence (Spark, few examples, session fixture) -----------

ts_seconds = st.integers(min_value=0, max_value=7200 * 3)  # spans >3 buckets


@given(
    st.lists(ts_seconds, min_size=1, max_size=25, unique=True),  # build times
    st.lists(ts_seconds, min_size=1, max_size=15),               # probe times
    st.integers(min_value=1, max_value=3),                       # n keys
)
@settings(max_examples=12, deadline=None)
def test_asof_bucketed_equals_plain_property(spark, build_ts, probe_ts, n_keys):
    """The bucketed as-of must equal the plain construction on arbitrary
    build/probe time sets, including bucket-edge and empty-bucket layouts."""
    from datetime import datetime, timezone

    from trading_etl_spark.operators.asof import (
        asof_join_backward,
        asof_join_backward_bucketed,
    )

    def _t(s):
        return datetime.fromtimestamp(1704067200 + s, tz=timezone.utc).replace(
            tzinfo=None
        )

    build = spark.createDataFrame(
        [
            (f"k{i % n_keys}", _t(s), float(s))
            for i, s in enumerate(sorted(build_ts))
        ],
        "k string, time timestamp, bid double",
    )
    probe = spark.createDataFrame(
        [(f"k{i % n_keys}", _t(s), i) for i, s in enumerate(probe_ts)],
        "k string, time timestamp, tag long",
    )
    kw = dict(on="time", by=["k"], value_cols=["bid"])
    plain = {
        (r["tag"]): r["bid"]
        for r in asof_join_backward(probe, build, **kw).collect()
    }
    bucketed = {
        (r["tag"]): r["bid"]
        for r in asof_join_backward_bucketed(
            probe, build, bucket_seconds=3600, **kw
        ).collect()
    }
    assert bucketed == plain


# --- pack_sequences vs a brute-force packing oracle --------------------------

pack_counts = st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25)
pack_budgets = st.integers(min_value=1, max_value=120)


@given(pack_counts, pack_budgets)
@settings(max_examples=5, deadline=None)
def test_pack_sequences_matches_bruteforce(spark, counts, budget):
    """Shard assignment must equal the single-threaded packing over the
    global md5(doc_id) order for ANY budget/corpus — the distributed
    two-pass prefix sum is an implementation detail, not a semantic."""
    import hashlib

    from trading_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(counts)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["shard_id"], r["token_offset"], r["n_tokens"])
        for r in tx.pack_sequences(docs, budget=budget).collect()
    }
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i, n) for i, n in enumerate(counts)
    )
    acc = 0
    for _h, i, n in order:
        assert got[i] == (acc // budget, acc, n), (i, got[i], acc)
        acc += n
    assert len(got) == len(counts)


def test_asof_nearest_matches_naive_on_random_series(spark_prop):
    """Bucketed nearest as-of must equal the obvious per-probe min-|Δt|
    scan (ties → earlier tick) on random series across bucket edges."""
    import random
    from datetime import datetime

    from trading_etl_spark.operators.asof import asof_join_nearest_bucketed

    rng = random.Random(11)

    def t(h, m, s):
        return datetime(2024, 1, 1, h, m, s)

    quotes = [
        ("K", t(rng.randrange(24), rng.randrange(60), rng.randrange(60)), float(i))
        for i in range(60)
    ]
    probes = [
        ("K", t(rng.randrange(24), rng.randrange(60), rng.randrange(60)), f"p{i}")
        for i in range(40)
    ]
    qdf = spark_prop.createDataFrame(quotes, "k string, time timestamp, bid double")
    pdf = spark_prop.createDataFrame(probes, "k string, time timestamp, tag string")
    got = {
        r["tag"]: (r["bid"], r["asof_lag_seconds"])
        for r in asof_join_nearest_bucketed(
            pdf, qdf, on="time", by=["k"], value_cols=["bid"], bucket_seconds=3600
        ).collect()
    }
    for _k, pt, tag in probes:
        best = None
        for _qk, qt, bid in quotes:
            d = abs((qt - pt).total_seconds())
            back = qt <= pt
            # order: smaller distance wins; tie → backward side; then the
            # deterministic per-side pick is the nearest time (unique times
            # not guaranteed — accept any bid at the winning time/side)
            key = (d, 0 if back else 1)
            if best is None or key < best[0]:
                best = (key, qt, back, {bid})
            elif key == best[0]:
                best[3].add(bid)
        if best is None:
            assert got[tag] == (None, None)
        else:
            (d, _), qt, back, bids = best
            want_lag = int((pt - qt).total_seconds())
            assert got[tag][1] == want_lag, (tag, got[tag], want_lag)
            assert got[tag][0] in bids, (tag, got[tag], bids)


# --- incremental SCD2 merge ≡ full rebuild (Spark, few examples) -------------


@given(
    st.lists(  # change log: (user bucket, ts-second, value bucket)
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=0, max_value=500),  # cursor second
)
@settings(max_examples=10, deadline=None)
def test_scd2_apply_equals_full_rebuild_property(spark, log, cursor_s):
    """apply(rebuild(log ≤ T), log > T) must equal rebuild(log) for ANY log
    and cursor — including empty pre/post slices, absorbed equal-value
    runs, same-ts events for one key (event_id breaks the tie), and keys
    that exist only on one side of the cursor."""
    from datetime import datetime, timedelta

    from trading_etl_spark.operators.reconcile import scd2_apply
    from trading_etl_spark.queries.analytics import scd2_build

    t0 = datetime(2024, 1, 1)
    rows = [
        (u, t0 + timedelta(seconds=s), i, float(v))
        for i, (u, s, v) in enumerate(log)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    cursor = t0 + timedelta(seconds=cursor_s)
    full = {tuple(r) for r in scd2_build(ev).collect()}
    pre = ev.filter(F.col("ts") <= F.lit(cursor))
    post = ev.filter(F.col("ts") > F.lit(cursor))
    merged = {
        tuple(r) for r in scd2_apply(scd2_build(pre), post).collect()
    }
    assert merged == full


def _brute_exsub(doc_texts, k, min_tokens):
    """Reference mirror of exact_substring_spans: per doc, positions whose
    k-gram occurs in ANY other doc, stitched into maximal islands."""
    toks = {d: (t.split(" ") if t else [""]) for d, t in doc_texts}
    grams = {
        d: [" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)]
        for d, tk in toks.items()
    }
    gram_sets = {d: set(g) for d, g in grams.items()}
    out = set()
    for d, gs in grams.items():
        dup = [
            i + 1  # 1-indexed
            for i, g in enumerate(gs)
            if any(g in gram_sets[o] for o in gram_sets if o != d)
        ]
        if not dup:
            continue
        start = prev = dup[0]
        islands = []
        for p in dup[1:]:
            if p == prev + 1:
                prev = p
                continue
            islands.append((start, prev))
            start = prev = p
        islands.append((start, prev))
        for s, e in islands:
            n = e - s + k
            if n >= min_tokens:
                out.add((d, s, e + k - 1, n))
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=25),
        min_size=2,
        max_size=4,
    )
)
@settings(max_examples=25, deadline=None)
def test_exact_substring_matches_bruteforce(spark, docs_tokens):
    """Property: the distributed positional-shingle + island-stitch
    construction equals a per-doc brute force on arbitrary low-alphabet
    corpora (max gram collisions — the stress case for stitching and the
    cross-doc-distinct rule). k=3/min=4 keeps tiny docs meaningful."""
    from trading_etl_spark.operators import text as tx

    doc_texts = [(i, " ".join(tks)) for i, tks in enumerate(docs_tokens)]
    df = spark.createDataFrame(
        [(d, t, "en") for d, t in doc_texts], "doc_id long, text string, lang string"
    )
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_tokens"])
        for r in tx.exact_substring_spans(df, k=3, min_tokens=4).collect()
    }
    want = _brute_exsub(doc_texts, k=3, min_tokens=4)
    assert got == want


@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=0, max_size=12),
        min_size=8,
        max_size=24,
    )
)
@settings(max_examples=12, deadline=None)
def test_incremental_dedup_equals_restricted_full_pass(spark, docs_tokens):
    """Property (r11): the incremental batch-vs-corpus gate must equal the
    FULL all-pairs LSH result restricted to cross-split pairs plus the
    top-1 election — i.e. probing the index loses nothing and invents
    nothing vs running the complete pass and filtering. Low-alphabet docs
    maximize band collisions (the stress case for the split predicate)."""
    from trading_etl_spark.operators import text as tx

    rows = [(i, " ".join(tks)) for i, tks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = tx.dedup_minhash_lsh(df).collect()
    best: dict[int, tuple[float, int]] = {}
    for r in full:
        for b, c in ((r["doc_a"], r["doc_b"]), (r["doc_b"], r["doc_a"])):
            if b % tx.INCREMENTAL_BATCH_MOD != tx.INCREMENTAL_BATCH_REM:
                continue
            if c % tx.INCREMENTAL_BATCH_MOD == tx.INCREMENTAL_BATCH_REM:
                continue  # batch-batch pair: invisible to the probe
            # highest jaccard, smallest corpus id on ties
            cand = (-r["jaccard"], c)
            if b not in best or cand < best[b]:
                best[b] = cand
    want = {(b, c, -nj) for b, (nj, c) in best.items()}

    got = {
        (r["doc_id"], r["dup_of"], r["jaccard"])
        for r in tx.dedup_incremental_minhash(df).collect()
    }
    assert got == want
