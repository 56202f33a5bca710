"""Grouped top-k with map-side combining — the scale-out of the
``row_number().over(partitionBy(key))`` window.

The window form shuffles and sorts EVERY row of every group to keep k of
them. The two-level form cuts shuffle volume to ≤ k rows per (key,
input-batch): a map-side pass keeps each Arrow batch's local top-k per key,
and only those survivors shuffle into the final per-key merge — the same
partial-aggregation idea hash-aggregates get for free, applied to top-k
(Spark has no built-in bounded-heap aggregate for it). With P input
partitions the merge input is ≤ k·P rows per key instead of the full group —
the difference between sorting a Zipf-hot key's millions of rows and merging
a few hundred.

Several in-repo windows document this as their 100 TB replacement (e.g.
weighted_sample's per-stratum top-k); this operator is that replacement,
verified equal to the window form by tests/test_topk.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_top_k(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    tie_col: str | None = None,
) -> DataFrame:
    """Top-k rows per key group by ``order_col`` DESC (NULL **and NaN**
    scores last), ties broken by ``tie_col`` ASC with NULL/NaN ties LAST —
    the one ordering both engines of this operator (pandas map stage, Spark
    merge window) express identically. Float NaN is normalized to NULL in
    the sort keys before EITHER stage sees it: pandas' ``na_position`` treats
    NaN as missing while Spark's ``desc_nulls_last`` sorts a non-null NaN
    double as the LARGEST value, so without the normalization a NaN row the
    window form would rank #1 could be discarded map-side (advisor finding,
    r6). NULL group keys form their own group (``dropna=False``), as the
    window form does. Output = input columns; note float NaN VALUES in the
    output surface as NULL — the rows themselves are selected correctly,
    but the Arrow map stage carries NaN→NULL (the repo-wide convention).

    Stage 1 (map-side, no shuffle): each Arrow batch keeps its local
    top-k per key — output bounded by k·keys-per-batch. Stage 2: the
    survivors shuffle once on the key and a bounded sort-slice per group
    picks the global top-k. Equal to the NaN-normalized row_number window
    by the exchange-the-extremes argument: any row outside a batch's local
    top-k is beaten by k rows in that batch alone, so it can never be in
    the global top-k.
    """
    cols = df.columns
    reserved = {"_ord", "_tie", "_rk"} & set(cols)
    if reserved:
        # withColumn would silently OVERWRITE an input column with one of
        # these names and the final select(*cols) would return the
        # normalized internal values instead of the user's data (advisor
        # finding, r7) — refuse loudly instead.
        raise ValueError(
            f"grouped_top_k reserves internal column names {sorted(reserved)}; "
            "rename the input column(s) first"
        )
    tie = tie_col or order_col

    def _null_if_nan(c: str) -> F.Column:
        # isnan is only defined on float/double columns.
        if df.schema[c].dataType.typeName() in ("float", "double"):
            return F.when(F.isnan(c), F.lit(None)).otherwise(F.col(c))
        return F.col(c)

    work = df.withColumn("_ord", _null_if_nan(order_col)).withColumn(
        "_tie", _null_if_nan(tie)
    )

    def local_heads(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield (
                    pdf.sort_values(
                        ["_ord", "_tie"],
                        ascending=[False, True],
                        na_position="last",
                    )
                    .groupby(list(keys), sort=False, dropna=False)
                    .head(k)
                )

    survivors = work.mapInPandas(local_heads, work.schema)
    w = Window.partitionBy(*keys).orderBy(
        F.desc_nulls_last("_ord"), F.asc_nulls_last("_tie")
    )
    return (
        survivors.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select(*cols)
    )
