"""Distributed graph operators for dedup canonicalization.

After pair-finding (minhash/simhash/embedding LSH), production dedup needs
one more step the pairwise operators don't give: grouping transitively-
connected near-dups into clusters and electing one keeper per cluster.
That is connected components over the dup-pair graph.

No reference analog (the reference has no dedup at all) — this is part of
the LLM-training-data-pipeline surface mandated as first-class by
BASELINE.json.

Scale design: Pregel-style min-label propagation — each iteration is one
equi-join (labels ⋈ edges on the source id) plus one hash-agg (min label
per destination), both shuffles keyed on node id. Lineage is truncated
every iteration with ``localCheckpoint`` so plans stay O(1) deep.
Iteration count is bounded by the dup-graph DIAMETER, which for real
dedup graphs is tiny (clusters are near-cliques: copies of the same
underlying document all share bands with each other). For adversarially
long path-graphs, the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) converges in
O(log n) rounds with the same per-round join shape — swap it in if
cluster diameters ever matter; the driver-side loop-with-convergence-
check skeleton is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "u",
    dst: str = "v",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``nodes``: one row per vertex (column ``id_col``); isolated vertices
    become singleton components. ``edges``: undirected pairs (``src``,
    ``dst``), either orientation. Returns (id, comp) where comp is the
    MINIMUM vertex id reachable from ``id`` — deterministic regardless of
    partitioning, the property the oracle compare needs.

    The convergence check is a driver-side ``count()`` per round — the
    standard iterative-algorithm pattern (GraphX does the same); the data
    itself never leaves the executors.
    """
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("comp")
    ).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["u"] == labels["id"])
            .groupBy("v")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # old and new label in ONE checkpointed relation: the convergence
        # count is then an in-memory scan, not a second join per round.
        joined = (
            labels.join(nbr, labels["id"] == nbr["v"], "left")
            .select(
                labels["id"].alias("id"),
                F.col("comp").alias("old_comp"),
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = joined.filter(F.col("comp") != F.col("old_comp")).count()
        labels = joined.select("id", "comp")
        if changed == 0:
            break
    return labels
