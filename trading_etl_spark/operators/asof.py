"""As-of (backward) join — match each probe row to the most recent build row
at or before its time, per key.

Spark has no native as-of join (the reference has none either — §2.4 lists
range/as-of as absent — but a trading engine wants one: "price at the time
of the event"). Implemented as a composition of built-in operators, the
scalable construction:

1. tag and union the two sides (probe rows carry NULL build values);
2. one window over (key) ordered by (time, side) takes ``last(value,
   ignorenulls=True)`` with an unbounded-preceding frame — each probe row
   sees the latest non-null build value at or before it (build side sorts
   first on ties, so an exactly-simultaneous quote matches);
3. keep probe rows.

Cost: ONE shuffle on the key + a per-partition sort — identical shape to a
sort-merge join, no range cross-product, no per-row UDF. At 100 TB both
sides shuffle once on the same key; skewed keys split fine because the
window frame is running (rows within a key stay ordered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """For each ``probe`` row: latest ``build`` values with build.on <= probe.on.

    ``on``: the time column name, present in both sides. ``by``: equi-join
    keys. ``value_cols``: build-side columns to carry over (must not collide
    with probe column names). Probe rows with no prior build row keep NULLs.
    """
    collisions = set(value_cols) & set(probe.columns)
    if collisions:
        raise ValueError(f"value_cols collide with probe columns: {collisions}")

    probe_cols = probe.columns
    p = probe.withColumn("_side", F.lit(1))
    for v in value_cols:
        p = p.withColumn(v, F.lit(None).cast(build.schema[v].dataType))
    b = build.select(*by, on, *value_cols).withColumn("_side", F.lit(0))
    for c in probe_cols:
        if c not in b.columns:
            b = b.withColumn(c, F.lit(None).cast(probe.schema[c].dataType))

    unioned = p.unionByName(b)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for v in value_cols:
        unioned = unioned.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return unioned.filter(F.col("_side") == 1).select(*probe_cols, *value_cols)
