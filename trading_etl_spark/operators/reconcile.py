"""Table reconciliation: keyed diff of two table snapshots.

The data-quality counterpart of the reference's idempotency contract
(``tests/acceptance/_test_transform_idempotency.py:110-120`` asserts
re-runs add zero rows): production ETL also needs to EXPLAIN a drift —
which keys were added, removed, or changed between a table and its
re-computed twin (or yesterday's snapshot). That is a keyed full-outer
join with null-safe column compare.

Scale shape: ONE full-outer shuffle join on the key (both sides hash-
partition once; AQE skew-join splits a hot key at runtime); the change
classification is map-side codegen over null-safe comparisons
(``eqNullSafe`` ↔ SQL ``IS NOT DISTINCT FROM``); unchanged keys are
filtered before anything leaves the join stage, so the output is
O(drift), not O(table). At 100 TB, run per partition (date) and diff
only the partitions a recompute touched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(keys…, change_type) with change_type ∈ added | removed | changed
    (| unchanged when ``include_unchanged``).

    ``added``: key only in ``new``; ``removed``: only in ``old``;
    ``changed``: present in both with any compare column differing under
    null-safe equality (a NULL→value transition counts as a change).
    """
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}") for c in compare_cols])
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}") for c in compare_cols])
    # a non-null marker per side: key presence survives the outer join even
    # when every compare column is legitimately NULL
    o = o.withColumn("_o_present", F.lit(1))
    n = n.withColumn("_n_present", F.lit(1))
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_o_present").isNull(), F.lit("added"))
        .when(F.col("_n_present").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(*keys, change.alias("change_type"))
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out
