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

from scala_etl_test_spark.caching import tracked_persist


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
    e = e.transform(tracked_persist)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    # ONE node-sized state table carries everything the per-iteration math
    # needs (node, deg, n_nodes): the per-iteration rank⋈deg join and the
    # per-iteration crossJoin(n) of the previous shape re-joined CONSTANT
    # node state every round — 2 joins × num_iters plan nodes for values
    # that never change. Folding them into the state costs two extra
    # columns on node-sized rows and removes both joins from every
    # iteration (same arithmetic, same expressions ⇒ bit-identical ranks).
    state = (
        deg.select(F.col("src").alias("node"), "deg")
        .crossJoin(F.broadcast(n))
        .transform(tracked_persist)
    )
    ranks = state.select(
        "node", "deg", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )

    base = F.lit(1.0 - damping) / F.col("n_nodes")
    maybe_bc = F.broadcast if broadcast_nodes else (lambda df: df)
    for i in range(num_iters):
        weights = ranks.select(
            F.col("node").alias("src"), (F.col("rank") / F.col("deg")).alias("w")
        )
        contribs = (
            e.join(maybe_bc(weights), "src")
            .groupBy("dst")
            .agg(F.sum("w").alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        # left join: a node with no in-edges keeps the teleport mass only.
        ranks = state.join(maybe_bc(contribs), "node", "left").select(
            "node",
            "deg",
            "n_nodes",
            (base + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))).alias(
                "rank"
            ),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < num_iters:
            ranks = ranks.localCheckpoint()

    result = ranks.select("node", F.round("rank", 6).alias("rank"))
    return result


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED simple graph, via the
    degree-orientation algorithm (Cohen 2009 / Suri & Vassilvitskii 2011
    "MapReduce clustering coefficient") — the standard way to keep
    distributed triangle enumeration from exploding on hubs.

    Every undirected edge is oriented from its lower-(degree, id) endpoint
    to the higher one; the DAG that results has out-degree O(sqrt(m)) for
    ANY graph (arboricity bound), so the wedge join (e1.dst = e2.src)
    generates at most m^1.5 candidates total — a hub of degree d no longer
    contributes d² wedges, because almost all its edges point INTO it.
    Each triangle {a,b,c} is counted exactly once as the wedge a→b→c
    closed by a→c.

    Input edges may be directed duplicates or self-loops; both are
    canonicalized away first. Scale: two shuffles build degrees + oriented
    edges; wedges are then closed ROW-LOCALLY by intersecting the two
    endpoints' sorted out-adjacency arrays (each bounded at O(sqrt(m)) by
    the orientation), so no wedge-sized data ever crosses an exchange —
    every shuffled row is an edge or an adjacency list with the hub
    problem already neutralized.

    Returns (node, n_triangles) for every node in ≥1 triangle.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = und.transform(tracked_persist)
    # Materialize the canonical edge cache ONCE before fan-out: its two
    # consumers (the degree aggregation and the degree-attach join) start
    # as CONCURRENT query stages, and a cold InMemoryRelation is computed
    # by every racer — profiled at sf0.1 as two ~20 s-exRun copies of the
    # upstream pair build (the most expensive subtree here) feeding one
    # 0.19 MB exchange each. One bounded count() serializes that build;
    # the racers then read warm blocks. (Plan-build job: allowlisted in
    # tests/test_planbuild_jobs.py with the other loop/probe queries.)
    und.count()
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    withdeg = (
        und.join(deg.select(F.col("v").alias("a"), F.col("d").alias("da")), on="a")
        .join(deg.select(F.col("v").alias("b"), F.col("d").alias("db")), on="b")
    )
    # orient low -> high by (degree, id): a total order, so the result is a DAG
    a_low = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(a_low, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_low, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    oriented = oriented.transform(tracked_persist)
    oriented.count()  # same racer dedup for its three consumers (adj + 2 join sides)
    # Sorted out-adjacency per node — bounded at O(sqrt(m)) ids per row by
    # the orientation (arboricity bound), so collect_list can never build
    # a hub-sized buffer. Each oriented edge (x, z) then closes its
    # triangles ROW-LOCALLY as array_intersect(N+(x), N+(z)): triangle
    # {a,b,c} with a→b, a→c, b→c is found exactly once, on edge (a, b),
    # as c ∈ N+(a) ∩ N+(b). The previous shape materialized every wedge
    # x→y→z through the e1⋈e2 join and then shuffled ALL O(m^1.5) wedge
    # rows into a semi-join on (x, z); the intersection form moves only
    # the m edge rows plus two adjacency payloads (Σ out-deg = m ids) and
    # closes wedges inside whole-stage codegen — no wedge-sized exchange
    # exists at any scale.
    adj = (
        oriented.groupBy("lo")
        .agg(F.array_sort(F.collect_list("hi")).alias("_nbrs"))
        .transform(tracked_persist)  # consumed by BOTH tri join sides
    )
    tri = (
        oriented.join(
            adj.select(F.col("lo"), F.col("_nbrs").alias("_nx")), on="lo"
        )
        .join(
            adj.select(F.col("lo").alias("hi"), F.col("_nbrs").alias("_nz")),
            on="hi",
        )
        .select(
            F.col("lo").alias("x"),
            F.col("hi").alias("z"),
            F.explode(F.array_intersect("_nx", "_nz")).alias("y"),
        )
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_node
