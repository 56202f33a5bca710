"""Multi-dimensional data layout: Z-order (Morton) clustering for skip-scans.

Parquet data skipping works off per-row-group min/max statistics: a scan
prunes a row group when the predicate cannot match its [min, max]. Sorting by
ONE column makes that column's ranges tight and every other column's ranges
full-width — a time-sorted table answers time predicates with pruning but
scans everything for a user predicate. Z-ordering interleaves the bits of two
(or more) bucketized dimensions into one sort key, so row groups become
axis-aligned rectangles in BOTH dimensions: each column's per-row-group range
shrinks to ~√(row_group/total) of its domain, and point/range predicates on
EITHER column prune most groups. This is the Delta Lake / Iceberg
``ZORDER BY`` feature expressed as a plain column expression + range write —
no table format required (cf. the public OPTIMIZE ZORDER docs; the Morton
code itself is Morton 1966).

Everything is JVM-side codegen (shift/mask/or chains) — no UDF.

Scale notes: the write path is ``repartitionByRange(key)`` +
``sortWithinPartitions(key)`` — one range-exchange of the data being laid
out, the same cost as any sorted write, paid once at write time to make
every subsequent scan prune. Re-cluster periodically as data accretes
(the maintenance compaction hook is the natural place).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per-dimension resolution; 2 dims × 16 bits → 32-bit key


def interleave_bits(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative int
    columns: result bit 2i carries a's bit i, bit 2i+1 carries b's bit i.
    Pure shift/mask/or expression chain — whole-stage codegen, no UDF."""
    a = a.cast("long")
    b = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return key


def zorder_key(
    a: Column, b: Column, a_max: int, b_max: int, bits: int = ZORDER_BITS
) -> Column:
    """Z-order key for two columns already reduced to non-negative ints
    (bucket ids, epoch minutes, ranks…): each is scaled into [0, 2^bits)
    against its known max so both dimensions get equal bit-resolution,
    then Morton-interleaved. ``a_max``/``b_max`` come from catalog stats
    (or a bounds pass) — the same two-pass shape as the histogram.

    Out-of-range inputs (stale catalog stats: value > max, or a negative
    value) clamp to the edge of the key space instead of overflowing —
    an unclamped scaled value would spill past ``bits`` bits and
    ``interleave_bits`` would silently drop the high bits, WRAPPING the
    key so fresh out-of-range rows sort into arbitrary buckets (advisor
    finding, r6). Clamping degrades them to the edge bucket: still
    clustered, stats merely looser until the next bounds refresh."""
    scale = (1 << bits) - 1
    an = F.floor(a.cast("double") / F.lit(float(max(a_max, 1))) * scale).cast("long")
    bn = F.floor(b.cast("double") / F.lit(float(max(b_max, 1))) * scale).cast("long")
    an = F.least(F.greatest(an, F.lit(0).cast("long")), F.lit(scale).cast("long"))
    bn = F.least(F.greatest(bn, F.lit(0).cast("long")), F.lit(scale).cast("long"))
    return interleave_bits(an, bn, bits)


def zorder_bucket_stats(
    df: DataFrame,
    a: Column,
    b: Column,
    a_max: int,
    b_max: int,
    n_buckets: int = 8,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Layout-quality report for a Z-order clustering: assign every row to
    its range bucket of the Morton key space and report each bucket's
    row count and per-dimension min/max — the exact rectangle a parquet
    row group's statistics would carry after ``write_zordered``, i.e. what
    a scan with a predicate on EITHER dimension could prune against.

    Deliberately NOT a global sort/ntile: the bucket id is
    ``zkey >> (2*bits - log2(n_buckets))`` — a pure map-side expression —
    so the plan is scan → project → hash-agg, shuffle bounded by
    ``n_buckets``, no single-partition window at any scale.
    ``n_buckets`` must be a power of two for the shift to be exact.
    """
    # n_buckets <= 0 must be rejected too (ADVICE r8: 0 & -1 == 0 slipped
    # the bit test and collapsed every row into bucket 0 via an oversized
    # shift instead of raising).
    if n_buckets <= 0 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 2 * bits - n_buckets.bit_length() + 1
    key = zorder_key(a, b, a_max, b_max, bits)
    return (
        df.select(
            F.shiftrightunsigned(key, shift).cast("int").alias("bucket"),
            a.cast("long").alias("_a"),
            b.cast("long").alias("_b"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_a").alias("min_a"),
            F.max("_a").alias("max_a"),
            F.min("_b").alias("min_b"),
            F.max("_b").alias("max_b"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    key: Column,
    n_files: int = 8,
) -> None:
    """Lay ``df`` out clustered by ``key``: range-partition into
    ``n_files`` buckets of the key space and sort within each, so parquet
    row-group min/max stats are tight in every dimension the key
    interleaves. One range exchange; plain parquet output (first-wins /
    maintenance semantics unchanged — layout is orthogonal to them)."""
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
