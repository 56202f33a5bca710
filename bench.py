"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes end-to-end into a noop sink (full plan, no driver
collect). Timings exclude session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the operators that dominate real workloads. Trading core +
# (as implemented) LLM-pipeline ops. Keep in sync with registry keys.
HEADLINE = [
    "ohlc_1m",
    "ohlc_derived_multi_tf",
    "sma_14_1h",
    "ema_14_1h",
    "rsi_14_1h",
    "sma_golden_cross",
    "backtest_pnl",
    "event_asof_tick",
    "event_reaction_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "embedding_knn_bruteforce",
    "embedding_knn_ivf_kmeans",
]

# Warm-up query OUTSIDE the candle chain (JVM/codegen/parquet-footer warmup
# without pre-populating the chain cache the headline queries then reuse).
WARMUP = "text_lang_id"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from trading_etl_spark.registry import build_queries
    from trading_etl_spark.session import get_spark

    spark = get_spark("bench")
    queries = build_queries()

    # Warm the JVM/codegen/parquet-footer caches so timings reflect
    # steady-state query execution, not first-query startup. The warm-up
    # query is deliberately OUTSIDE the candle chain so the chain build is
    # measured, not hidden (ADVICE r1).
    if WARMUP in queries:
        queries[WARMUP](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Warm the Python/Arrow worker pool too: the first pandas-UDF query would
    # otherwise pay worker fork + Arrow init — startup cost, not query cost.
    from pyspark.sql import functions as F

    tiny = spark.range(64).withColumn("g", F.col("id") % 4)
    tiny.groupBy("g").applyInPandas(lambda p: p, "id long, g long").write.format(
        "noop"
    ).mode("overwrite").save()

    # And the broadcast-join + struct-min_by codegen paths: the FIRST
    # broadcast join in a session pays ~5 s of one-time broadcast-exchange +
    # Janino compile cost regardless of data size (measured: identical on 264
    # rows and 100k rows). Warm it on 64 synthetic rows so candle_chain_cold
    # measures the chain, not JVM initialization.
    dim = spark.range(6).withColumnRenamed("id", "k")
    (
        tiny.join(F.broadcast(dim), tiny.id % 6 == dim.k)
        .groupBy("g")
        .agg(F.min_by(F.struct("id", "k"), F.struct("k", "id")).alias("m"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}

    # Cold candle-chain build, reported as its own line: tick scan → dedup →
    # 1m agg → derived agg, single shuffle. The chain cache it populates is
    # the in-session analog of the reference's materialized OHLC tables;
    # subsequent per-query numbers measure query logic over those cached
    # relations (and say so here rather than pretending otherwise).
    t0 = time.time()
    queries["ohlc_derived_multi_tf"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings["candle_chain_cold"] = round(time.time() - t0, 3)
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
