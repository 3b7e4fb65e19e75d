"""Iterative graph analytics on edge DataFrames (beyond-reference tier).

Complements :mod:`operators.cluster` (connected components for dedup
cliques) with fixed-iteration PageRank — the standard importance measure
for link-graph-based corpus curation (e.g. domain authority as a quality
prior for web-scraped training data, OPIC-style crawl prioritization).

Scale shape: the edge table is the big side; rank/degree state is one
narrow row per node. Two regimes, picked by ``broadcast_nodes``:

- node state fits an executor (the default; holds into the hundreds of
  millions of nodes) — degrees and per-iteration ranks are broadcast, so
  the persisted edge table is **never shuffled or sorted**, and each
  iteration costs one map-side-combined aggregation whose exchange carries
  at most one row per node per task;
- billion-node regime — edges are hash-partitioned on ``src`` once and
  persisted (bucket by src at write time for a 100 TB edge list), the
  optimizer keeps the cached partitioning, and each iteration shuffles
  only the node-sized rank table onto that fixed layout.

Lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
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
    broadcast_nodes: bool = True,
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
    if not broadcast_nodes:
        # Billion-node regime: one shuffle lays the edges out by src and the
        # cached partitioning is kept, so each iteration shuffles only the
        # node-sized weight table onto that fixed layout.
        e = e.repartition("src")
    # The cached edge list stays bare (src, dst): degree is NODE-sized
    # state, so rank/deg is computed node-side each iteration and only that
    # single weight column meets the edges — no degree column riding along
    # on every edge row, and in the broadcast regime the edge table is
    # never shuffled or sorted at all.
    e = e.persist()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()

    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes")).persist()
    nodes = deg.select(F.col("src").alias("node")).persist()
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )

    base = F.lit(1.0 - damping) / F.col("n_nodes")
    maybe_bc = F.broadcast if broadcast_nodes else (lambda df: df)
    for i in range(num_iters):
        weights = (
            ranks.withColumnRenamed("node", "src")
            .join(deg, "src")
            .select("src", (F.col("rank") / F.col("deg")).alias("w"))
        )
        contribs = (
            e.join(maybe_bc(weights), "src")
            .groupBy("dst")
            .agg(F.sum("w").alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        # left join: a node with no in-edges keeps the teleport mass only.
        ranks = (
            nodes.join(maybe_bc(contribs), "node", "left")
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
