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


class TestTriangleCount:
    def test_known_graph(self, spark):
        from scala_etl_test_spark.operators.graph import triangle_count

        # K4 on {1,2,3,4}: every node in C(3,2)=3 triangles; 5 dangles off 1
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        from scala_etl_test_spark.operators.graph import triangle_count

        rng = random.Random(7)
        nodes = list(range(30))
        edges = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
        )
        adj = {v: set() for v in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for v in (a, b, c):
                    want[v] = want.get(v, 0) + 1
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        assert got == want

    def test_duplicate_and_self_edges_canonicalized(self, spark):
        from scala_etl_test_spark.operators.graph import triangle_count

        edges = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}
