"""Similarity search over an embedding column (``array<float>``) — the
vector half of the LLM-data-pipeline surface (north-star extension).

Cosine similarity is computed JVM-side with higher-order array functions
(``zip_with`` + ``aggregate`` — whole-stage-codegen'd, no Python UDF), in
double precision to match the oracle bit-for-bit after 6dp rounding.

Scale notes:
- Brute-force top-k is the O(n·q) baseline: queries × candidates with the
  small query side broadcast. Correct at any scale, cost grows linearly in
  corpus size — the verification baseline for ANN.
- The IVF-style variant prunes the candidate set to the query's coarse
  cluster (here: the ``label`` column as the inverted-file cell, i.e. the
  partition key). At 100 TB the corpus is partitioned by cell → a probe
  reads only its cell's partitions (partition pruning), the classic
  IVF trade: recall bounded by cell assignment, cost divided by n_cells.
- Embedding-cosine near-dup: all-pairs above threshold — quadratic baseline,
  LSH/IVF bucketing is the scale path (same pattern as minhash vs ngram).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 16  # vec_id < 16 are the demo query vectors
TOP_K = 3


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "emb", F.col("embedding").cast("array<double>")
    )


def _dot(a: str | Column, b: str | Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def knn_bruteforce(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """Exact top-k cosine neighbors for the query vectors (vec_id < n_queries).

    Ranking is on the 6dp-rounded similarity with vec_id tie-break so the
    ordering is engine-independent.
    """
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def knn_ivf(emb: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """IVF-style ANN: probe only the query's coarse cell (label column).
    Same output shape as brute force; recall limited to same-cell neighbors."""
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("cell"), F.col("emb").alias("qv")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("cell"), F.col("emb").alias("cv")
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("cell").alias("label"), "neighbor_id", "rank", "cos_sim")
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.35) -> DataFrame:
    """All vector pairs with cosine ≥ threshold (embedding near-dedup)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.round(cosine("va", "vb"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


# --- DuckDB oracle fragments -------------------------------------------------

EMB_SQL = """
emb AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
)
""".strip()

# list_cosine_similarity on DOUBLE[] matches the Spark double-precision
# zip_with/aggregate pipeline within 1e-12 — both sides round to 6dp.
COS_SQL = "round(list_cosine_similarity({a}, {b}), 6)"
