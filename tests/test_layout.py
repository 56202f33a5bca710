"""Z-order layout: Morton key correctness + the data-skipping property it
exists for — per-row-group min/max ranges tight in BOTH dimensions, where a
single-column sort leaves the other dimension full-width."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from trading_etl_spark.layout import interleave_bits, write_zordered, zorder_key


def test_interleave_bits_morton_pattern(spark):
    rows = spark.range(1).select(
        interleave_bits(F.lit(3), F.lit(0), 4).alias("a3"),
        interleave_bits(F.lit(0), F.lit(3), 4).alias("b3"),
        interleave_bits(F.lit(2), F.lit(1), 4).alias("m"),
        interleave_bits(F.lit(15), F.lit(15), 4).alias("full"),
    ).collect()[0]
    assert rows.a3 == 0b0101          # a occupies even bit positions
    assert rows.b3 == 0b1010          # b occupies odd bit positions
    assert rows.m == 0b0110           # a=2 → bit 2, b=1 → bit 1
    assert rows.full == 0xFF          # 4+4 bits all set


def _avg_rowgroup_range(files, col):
    spans, total = [], 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    spans.append(c.statistics.max - c.statistics.min)
                    total += 1
    assert total > 0
    return sum(spans) / total


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    # deterministic pseudo-random 2-D points on a 1024×1024 grid
    df = spark.range(0, 1 << 15).select(
        ((F.col("id") * 7919) % 1024).alias("u"),
        ((F.col("id") * 104729) % 1024).alias("t"),
    )
    z_dir = str(tmp_path / "zorder")
    t_dir = str(tmp_path / "tsorted")
    write_zordered(
        df, z_dir, zorder_key(F.col("u"), F.col("t"), 1023, 1023, 10), n_files=16
    )
    (
        df.repartitionByRange(16, "t")
        .sortWithinPartitions("t")
        .write.mode("overwrite")
        .parquet(t_dir)
    )
    zf = glob.glob(f"{z_dir}/part-*.parquet")
    tf = glob.glob(f"{t_dir}/part-*.parquet")
    # the time-sorted layout answers t-predicates well but leaves u
    # full-width; z-order must tighten u dramatically while keeping t
    # far below full-width too — the both-dimensions pruning property.
    u_z, u_t = _avg_rowgroup_range(zf, "u"), _avg_rowgroup_range(tf, "u")
    t_z = _avg_rowgroup_range(zf, "t")
    assert u_t > 900                  # single-sort leaves u unpruned
    assert u_z < u_t / 2, (u_z, u_t)  # z-order at least halves it
    assert t_z < 1024 * 0.75          # and t stays prunable as well


def test_zorder_key_monotone_per_axis(spark):
    # With the other coordinate fixed, the Morton key is strictly
    # increasing along each axis (each axis owns disjoint bit positions) —
    # the property that makes range predicates on either column map to
    # key ranges.
    from pyspark.sql import Window

    vals = spark.range(0, 64).select(F.col("id").alias("v"))
    for fixed in (0, 17, 63):
        w = Window.orderBy("v")
        ka = vals.select(
            "v", interleave_bits(F.col("v"), F.lit(fixed), 6).alias("k")
        ).withColumn("prev", F.lag("k").over(w))
        bad = ka.filter(F.col("prev").isNotNull() & (F.col("k") <= F.col("prev")))
        assert bad.count() == 0
        kb = vals.select(
            "v", interleave_bits(F.lit(fixed), F.col("v"), 6).alias("k")
        ).withColumn("prev", F.lag("k").over(w))
        assert kb.filter(
            F.col("prev").isNotNull() & (F.col("k") <= F.col("prev"))
        ).count() == 0


def test_zorder_bucket_stats_rectangles(spark):
    """Each range bucket of the Morton key space is an axis-aligned
    rectangle: with 8 buckets over 2 dims the key's top 3 bits are
    (b_hi, a_hi, b_mid), so per-bucket ranges must sit inside halves of
    dim a and quarters of dim b — the row-group stats a scan prunes on."""
    from trading_etl_spark.layout import zorder_bucket_stats

    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    rows = zorder_bucket_stats(
        df, F.col("a"), F.col("b"), 63, 63, n_buckets=8
    ).collect()
    assert len(rows) == 8 and sum(r["n_rows"] for r in rows) == 4096
    for r in rows:
        assert r["max_a"] - r["min_a"] <= 31, r  # half of dim a
        assert r["max_b"] - r["min_b"] <= 15, r  # quarter of dim b

    import pytest

    with pytest.raises(ValueError, match="power of two"):
        zorder_bucket_stats(df, F.col("a"), F.col("b"), 63, 63, n_buckets=6)

    # ADVICE r8: 0 & -1 == 0 slipped the bit test and silently collapsed
    # every row into bucket 0; non-positive counts must raise too
    for bad in (0, -8):
        with pytest.raises(ValueError, match="power of two"):
            zorder_bucket_stats(df, F.col("a"), F.col("b"), 63, 63, n_buckets=bad)
