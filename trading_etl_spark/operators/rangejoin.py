"""Interval (range) join — match right rows whose time falls inside a
window anchored at each left row: ``left.t + lower ≤ right.t ≤ left.t +
upper``. Another join class the reference lacks (SURVEY §2.4 absent list).

A naive theta-join is a per-key cross product; at scale that dies on dense
keys. The bucketized construction keeps it an EQUI-join:

1. right rows get one bucket id: ``floor(epoch/width)`` with
   ``width = upper − lower``;
2. each left row explodes to the (≤2) consecutive buckets its window can
   touch: ``floor((t+lower)/width) … floor((t+upper)/width)``;
3. equi-join on (keys…, bucket) then apply the exact range predicate.

Each (left, right) candidate pair meets in exactly ONE bucket (the right
row has a single bucket id), so no post-join dedup is needed. Cost: the
equi-join shuffle plus a ≤2× expansion of the left side — independent of
key density. This is the standard bucketized range-join used by the big
SQL engines; Spark's optimizer doesn't rewrite theta joins, so the library
does it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: list[str],
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Inner interval join; output = all left columns + right's non-key
    columns (names must not collide with left's)."""
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must be > lower_seconds")
    width = upper_seconds - lower_seconds
    right_val_cols = [c for c in right.columns if c not in by]
    collisions = set(right_val_cols) & set(left.columns)
    if collisions:
        raise ValueError(f"right columns collide with left columns: {collisions}")

    lt = F.unix_timestamp(left_on)
    rt = F.unix_timestamp(right_on)
    l = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((lt + lower_seconds) / width),
                F.floor((lt + upper_seconds) / width),
            )
        ),
    )
    r = right.withColumn("_bkt", F.floor(rt / width))
    joined = l.join(r, [*by, "_bkt"], "inner").filter(
        (rt >= lt + lower_seconds) & (rt <= lt + upper_seconds)
    )
    return joined.select(*left.columns, *right_val_cols)
