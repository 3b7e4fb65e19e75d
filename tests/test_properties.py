"""Property tests.

Pure-Python kernels get hypothesis (cheap, hundreds of examples); the
iterative Spark algorithms get seeded-random cross-checks against an
independent Python reference (union-find) — a handful of examples, since
each costs real Spark rounds.
"""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from scala_etl_test_spark.operators.multimodal import byte_histogram_features, fake_resize


@given(st.binary(min_size=0, max_size=2048), st.sampled_from([4, 16, 64, 256]))
@settings(max_examples=200, deadline=None)
def test_byte_histogram_is_a_normalized_histogram(payload, bins):
    feats = byte_histogram_features(payload, bins)
    assert len(feats) == bins
    assert all(f >= 0 for f in feats)
    if payload:
        assert abs(sum(feats) - 1.0) < 1e-9
        # vectorized result must equal the per-byte reference definition
        ref = [0] * bins
        for b in payload:
            ref[b * bins // 256] += 1
        assert feats == [c / len(payload) for c in ref]
    else:
        assert feats == [0.0] * bins


@given(st.binary(max_size=512), st.integers(8, 128), st.integers(8, 128))
@settings(max_examples=100, deadline=None)
def test_fake_resize_deterministic_and_sized(payload, w, h):
    out = fake_resize(payload, w, h)
    assert out == fake_resize(payload, w, h)
    assert len(out) == max(16, w * h // 64)


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id reachable; only nodes appearing in edges
    touched = {x for e in edges for x in e if e[0] != e[1]}
    comp = {}
    for x in touched:
        root = find(x)
        comp.setdefault(root, []).append(x)
    return {
        (node, min(members)) for members in comp.values() for node in members
    }


def test_cc_variants_match_union_find_on_random_graphs(spark):
    """Both CC implementations must match an independent union-find on
    seeded random graphs (sparse, dense, and multi-component)."""
    from scala_etl_test_spark.operators.cluster import (
        connected_components,
        connected_components_alternating,
    )

    rng = random.Random(0)
    for n_nodes, n_edges in [(12, 6), (16, 20), (30, 12)]:
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        want = _union_find_components(n_nodes, edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got_prop = {
            (r["node"], r["component"])
            for r in connected_components(df, max_rounds=40).collect()
        }
        got_alt = {
            (r["node"], r["component"])
            for r in connected_components_alternating(df).collect()
        }
        assert got_prop == want, (edges, got_prop, want)
        assert got_alt == want, (edges, got_alt, want)
