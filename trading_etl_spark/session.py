"""SparkSession factory.

Replaces the reference's SQLAlchemy engine / session management
(``src/database/base.py:8-26``, ``src/config/db_config.py:10-37``) — a Spark
session needs no global lock and no per-row round-trips.

Scale notes: settings here are cluster-safe defaults. On a real cluster the
same code runs unchanged — only ``master`` and memory sizing differ. AQE is on
so shuffle partition counts, skew joins and empty-partition coalescing are
re-planned at runtime from actual statistics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "trading_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession pinned to UTC with AQE enabled.

    UTC pinning mirrors the reference's explicit tz normalization
    (``src/gmo/ws_ticker_server.py:57-63``) and keeps timestamps comparable
    with naive-UTC engines (the DuckDB oracle).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "") or str(os.cpu_count() or 4)
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local-mode default is a 1g heap regardless of box size — far too
        # small for 32 executor threads (a 4M-row salted agg OOMs it, r9).
        # Size to the box the way a cluster deploy sizes executors; applies
        # only when this process launches the JVM (getOrCreate on an
        # existing session keeps its sizing).
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # a table bucketed on (pair, timeframe, version) must serve a join
        # keyed on those PLUS time without a shuffle: allow co-partitioning
        # on a subset of the join keys (rows equal on the subset are already
        # co-located, which is all hash joins need)
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parseable: stage progress bars interleave
        # carriage returns into check.py/bench output lines otherwise
        .config("spark.ui.showConsoleProgress", "false")
        # catalog tables (bucketed writes, saveAsTable) land here, not in cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/trading_etl_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
