"""Warehouse maintenance: retention and small-file compaction.

The reference planned both and built neither (retention:
``docs/devops-tasks/t11-retention-policy.md``; performance/layout work:
``t10-performance-index.md``). On a parquet lake these are partition-level
operations:

- retention = dropping whole partition directories (never row-level deletes
  — at 100 TB a row-filtering rewrite of history is the anti-pattern);
- compaction = rewriting ONE partition's many small files into few, sized to
  ``target_file_bytes`` (micro-batch appends and idempotent W1 appends both
  accrete small files; scans pay per-file overhead until compacted).

Both operate on one partition at a time so they can run incrementally and
idempotently alongside the pipelines.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def list_partitions(path: str, column: str) -> list[str]:
    """Hive-style partition values present under ``path`` for ``column``."""
    prefix = f"{column}="
    if not os.path.isdir(path):
        return []
    return sorted(
        d[len(prefix):] for d in os.listdir(path) if d.startswith(prefix)
    )


def drop_partitions_before(path: str, column: str, cutoff: str) -> list[str]:
    """Retention: remove partition directories with value < ``cutoff``
    (string comparison — use zero-padded / ISO-formatted partition values).

    Returns the dropped values. Directory removal is the parquet equivalent
    of the reference's planned retention DELETE — O(partitions), no rewrite.
    """
    dropped = []
    for value in list_partitions(path, column):
        if value < cutoff:
            shutil.rmtree(os.path.join(path, f"{column}={value}"))
            dropped.append(value)
    return dropped


def compact_partition(
    spark: SparkSession,
    path: str,
    column: str,
    value: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite one partition's files into ceil(bytes/target) files.

    Returns (files_before, files_after). The rewrite goes through a temp
    directory then an atomic-ish rename so a crash leaves either the old or
    the new layout, never a half-partition.
    """
    part_dir = os.path.join(path, f"{column}={value}")
    files = [
        os.path.join(part_dir, f)
        for f in os.listdir(part_dir)
        if f.endswith(".parquet")
    ]
    n_before = len(files)
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_target = max(1, -(-total_bytes // target_file_bytes))
    if n_target >= n_before:
        return (n_before, n_before)  # already compact

    df = spark.read.parquet(part_dir)
    tmp_dir = part_dir + "._compact_tmp"
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp_dir)
    shutil.rmtree(part_dir)
    os.rename(tmp_dir, part_dir)
    n_after = len([f for f in os.listdir(part_dir) if f.endswith(".parquet")])
    return (n_before, n_after)
