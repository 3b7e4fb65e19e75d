"""Iterative graph analytics on edge DataFrames (beyond-reference tier).

Complements :mod:`operators.cluster` (connected components for dedup
cliques) with fixed-iteration PageRank — the standard importance measure
for link-graph-based corpus curation (e.g. domain authority as a quality
prior for web-scraped training data, OPIC-style crawl prioritization).

Scale shape: the edge table is the big side and is hash-partitioned on
``src`` ONCE and persisted — the optimizer keeps the cached partitioning,
so every iteration's rank⋈edges join shuffles only the rank table (one row
per node, orders of magnitude smaller than the edges). Per iteration that
is two node-sized exchanges (ranks onto src, contributions onto dst) and
zero edge-sized ones. At a 100 TB edge list the same layout holds with the
edges bucketed by src at write time; rank state stays a narrow two-column
table. Lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
iterations, same policy as the CC loop (operators/cluster.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    num_iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration power-method PageRank over a directed edge list.

    Returns (node, rank) with ``rank`` rounded to 6 digits. The node set is
    taken from the distinct ``src`` column, so every node must appear as a
    source at least once (an undirected graph fed as both directions — the
    intended use — satisfies this trivially; it also means no dangling-mass
    redistribution is needed). Fixed iteration count, not
    convergence-tested: rank deltas shrink geometrically in ``damping`` and
    a handful of iterations is the standard curation-pipeline setting; a
    fixed count also keeps the computation expressible as unrolled SQL for
    the cross-engine oracle.
    """
    if num_iters < 1:
        raise ValueError("num_iters must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # One shuffle to lay the edges out by src; deg reuses that partitioning
    # (groupBy on the partition key adds no exchange) and the join below is
    # then co-partitioned — the persisted frame is scanned once per
    # iteration with no further edge-sized shuffle.
    e = e.repartition("src")
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = e.join(deg, "src").persist()

    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes")).persist()
    nodes = deg.select(F.col("src").alias("node")).persist()
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )

    base = F.lit(1.0 - damping) / F.col("n_nodes")
    for i in range(num_iters):
        contribs = (
            out_edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        # left join: a node with no in-edges keeps the teleport mass only.
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < num_iters:
            ranks = ranks.localCheckpoint()

    result = ranks.select("node", F.round("rank", 6).alias("rank"))
    return result
