"""JDBC source/sink — the reference's Postgres path re-expressed Spark-first.

The reference talks to Postgres through an SQLAlchemy engine with a global
lock and per-row ORM round-trips (``src/database/base.py:8-26``,
``src/config/db_config.py``); its schema DDL lives in ``src/database/sql``.
Spark replaces all of that with the built-in JDBC relation provider:
``spark.read.jdbc`` plans a *parallel partitioned scan* (one executor task
per predicate range) and ``df.write.jdbc`` does batched inserts from every
partition concurrently — no driver-side lock, no ORM.

Scale notes:
- A single-connection JDBC read is a 1-task scan no matter the cluster
  size. ``read_jdbc`` therefore requires (or derives) ``partitionColumn`` /
  ``lowerBound`` / ``upperBound`` / ``numPartitions`` for anything beyond
  dimension-table size: Spark turns those into ``numPartitions`` range
  predicates pushed into the database, so the scan parallelizes and no
  executor holds more than one range.
- ``fetchsize`` (read) and ``batchsize`` (write) keep the row round-trips
  amortized; the defaults (10/1000) are far too small for bulk ETL.
- Predicate pushdown: Catalyst pushes filters on the read into the remote
  WHERE clause — filter the DataFrame, don't pre-bake SQL strings.
- First-wins appends (the reference's ON CONFLICT DO NOTHING) stay in
  ``io.first_wins_append``: anti-join in Spark, then plain append here.

The wrapper is deliberately thin: it standardizes option plumbing and the
parallelism contract; everything else is the stock provider. Tests mock the
DataFrameReader/Writer chain — no live database in the sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH = 10_000
DEFAULT_BATCH = 10_000


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCH,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned parallel JDBC scan of ``table`` (any dbtable/subquery).

    When ``partition_column`` is given, all four partitioning options are
    required by the provider; ``num_partitions`` defaults to the session's
    shuffle partitions so the scan parallelism matches the rest of the plan.
    Without it the read is a single task — acceptable only for dims.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        if num_partitions is None:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    batchsize: int = DEFAULT_BATCH,
    isolation_level: str = "READ_COMMITTED",
    truncate: bool = False,
    properties: dict[str, str] | None = None,
) -> None:
    """Batched parallel JDBC write: every partition opens one connection and
    inserts in ``batchsize`` chunks. ``truncate=True`` with mode=overwrite
    issues TRUNCATE instead of DROP+CREATE so grants/indexes survive —
    the polite overwrite for a table the reference's DDL owns."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", isolation_level)
        .option("truncate", "true" if truncate else "false")
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
