from __future__ import annotations

import pytest

from scala_etl_test_spark.operators.graph import pagerank


def _ref_pagerank(edges: list[tuple[str, str]], iters: int, d: float = 0.85) -> dict[str, float]:
    nodes = sorted({s for s, _ in edges})
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for s, t in edges:
            contrib[t] += r[s] / deg[s]
        r = {v: (1.0 - d) / n + d * contrib[v] for v in nodes}
    return r


def _undirected(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    return pairs + [(b, a) for a, b in pairs]


def test_two_node_cycle_is_uniform(spark):
    edges = spark.createDataFrame(_undirected([("a", "b")]), ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, num_iters=4).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_star_matches_reference(spark):
    pairs = _undirected([("hub", f"leaf{i}") for i in range(4)])
    got = {r["node"]: r["rank"] for r in pagerank(spark.createDataFrame(pairs, ["src", "dst"]), num_iters=3).collect()}
    want = _ref_pagerank(pairs, 3)
    assert got.keys() == want.keys()
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    # the hub concentrates rank; mass is conserved (no dangling nodes)
    assert got["hub"] > got["leaf0"]
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_irregular_graph_matches_reference(spark):
    pairs = _undirected(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a"), ("c", "e")]
    )
    got = {r["node"]: r["rank"] for r in pagerank(spark.createDataFrame(pairs, ["src", "dst"]), num_iters=5, checkpoint_every=2).collect()}
    want = _ref_pagerank(pairs, 5)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_bad_iters_rejected(spark):
    edges = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(edges, num_iters=0)
