"""Continuous document ingest with incremental near-dedup (r11).

The streaming twin of ``operators/text.dedup_incremental_minhash``: newly
crawled documents land as files (production: the crawler's landing zone),
and every micro-batch probes the STATIC corpus LSH band index for its
near-duplicates — the gate a 100 TB corpus build runs on ingest, where the
all-pairs pass (``dedup_minhash_lsh``) ran once at bootstrap and is never
re-run.

Statelessness is the design point: each arriving doc is matched against
the CORPUS only, so no streaming state accumulates (contrast the exact
streaming dedup in queries/streamgate.py, whose hash→keeper state grows
with distinct content). Per micro-batch the probe is plain batch DataFrame
code over two cached static relations (the persisted index), run through
``foreachBatch`` — the same drain pattern as streaming/ticks.py's
first-wins append. Batch-to-batch near-duplicates pass through untouched
by construction; a deployment that must also catch those runs the periodic
full pass over the accreted corpus (the documented split of duties).

Reference parity: trading-etl's insert-skip idempotent append
(src/etl/flows/transform_services.py save paths) is the exact-key version
of this gate applied per poll cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.text import (
    _band_keys,
    _minhash_from_shingles,
    incremental_probe,
    shingles,
)

DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def build_corpus_index(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(shingles, band_keys) for the static corpus, each cached — the
    in-session analog of the persisted LSH index tables a production
    rollout writes once (band_keys bucketed by band_key, shingles by
    doc_id) and only appends to. Built lazily; the first micro-batch
    materializes both, every later batch reads the cache."""
    sh = shingles(corpus).cache()
    bands = _band_keys(_minhash_from_shingles(sh)).cache()
    return sh, bands


def start_incremental_dedup_stream(
    spark: SparkSession,
    source_path: str,
    corpus: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    corpus_index: tuple[DataFrame, DataFrame] | None = None,
) -> StreamingQuery:
    """File-stream of (doc_id, text) parquet → per-micro-batch LSH probe
    of the static ``corpus`` → parquet append of (doc_id, dup_of,
    jaccard) matches. New doc_ids must be disjoint from corpus doc_ids
    (the caller's ingest contract — a landing zone assigns fresh ids).

    ``corpus_index``: pass :func:`build_corpus_index`'s pair to share ONE
    cached index across several streams (and to own its unpersist
    lifetime — the production posture, where the index is a persisted
    table, not session cache); omitted, the stream builds and holds its
    own for the query's lifetime.

    No watermark and no streaming aggregation: the probe is stateless, so
    restart-from-checkpoint replays only unprocessed FILES (source
    bookkeeping), never rebuilds operator state."""
    sh_corpus, corpus_bands = corpus_index or build_corpus_index(corpus)

    new_docs = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_path)
    )

    def probe(batch: DataFrame, _batch_id: int) -> None:
        sh_batch = shingles(batch)
        batch_bands = _band_keys(_minhash_from_shingles(sh_batch))
        matches = incremental_probe(
            batch_bands,
            corpus_bands,
            sh_batch.unionByName(sh_corpus),
            threshold,
        )
        matches.write.mode("append").parquet(sink_path)

    return (
        new_docs.writeStream.foreachBatch(probe)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
