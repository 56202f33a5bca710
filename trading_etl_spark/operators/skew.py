"""Skew mitigation utilities: salted two-phase aggregation and salted joins.

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled`` — on in
session.py), which splits oversized shuffle-join partitions at runtime. These
helpers cover the cases AQE cannot rewrite:

- a hot *grouping* key overwhelming one reducer in an aggregation
  (``salted_count_distinct`` — two-phase: disjoint salt partitions of the
  value domain are counted independently, then summed);
- a hot *join* key in a shuffle join where the small side fits in memory but
  not under the broadcast threshold (``salted_join`` — the big side salts
  each row deterministically, the small side is replicated once per salt, so
  the hot key's rows spread over ``n_salts`` reducers).

Both are exact — results identical to the unsalted plan (tested) — and both
use deterministic salts (crc32, not rand()) so retried tasks produce the
same rows, which Spark's speculative execution / task-retry model requires.

Measured adjudication (r9, local[32], 95%-hot-key fixtures — the bench's
skew_join_agg_* lines keep it measured every round):

- ``salted_join`` wins ~2-4x over the naive shuffle join exactly in its
  documented niche: the small side too wide to broadcast AND a downstream
  per-key agg pinning the join's output partitioning (which blocks AQE's
  skew-split rewrite). When the small side CAN broadcast, AQE's runtime
  broadcast conversion beats salting ~10x — always leave broadcast
  available first.
- ``salted_count_distinct`` did NOT beat the native plan at any tested
  size (4M-48M rows): Spark rewrites a distinct agg into a two-phase
  aggregate whose first shuffle keys on (group, value), which already
  spreads a hot group, and map-side partial aggregation does the same for
  algebraic aggs. Keep the helper for cluster-scale cases where the
  final per-group stage concentrates enough distinct values on one
  reducer to spill; prefer the native plan elsewhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, n_salts: int) -> Column:
    return F.pmod(F.crc32(col.cast("string")), F.lit(n_salts)).cast("int")


def salted_count_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT value) in two phases.

    Phase 1 groups by (keys, salt(value)) — a hot group's distinct set is
    partitioned disjointly across ``n_salts`` reducers; phase 2 sums the
    partial distinct counts (disjointness makes the sum exact). Output
    column: ``n_distinct``.
    """
    phase1 = (
        df.withColumn("_salt", _salt(F.col(value_col), n_salts))
        .groupBy(*group_cols, "_salt")
        .agg(F.count_distinct(value_col).alias("_partial"))
    )
    return phase1.groupBy(*group_cols).agg(
        F.sum("_partial").cast("long").alias("n_distinct")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread across reducers.

    ``salt_from`` is a big-side column whose values vary within a hot key
    (e.g. a line number or timestamp) — it only seeds the salt, it does not
    change join semantics. The small side is replicated ``n_salts``× (an
    explode, NOT a shuffle), and the join key becomes (keys..., salt), so
    each hot key occupies ``n_salts`` partitions instead of one.
    """
    big_s = big.withColumn("_salt", _salt(F.col(salt_from), n_salts))
    small_r = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_r, [*keys, "_salt"], how).drop("_salt")
