"""Sequence packing: cumulative-offset pack assignment is deterministic per
shard, oversized docs span boundaries, and fill stats reconcile."""

from __future__ import annotations

from scala_etl_test_spark.operators.packing import pack_sequences, pack_stats


def _packed(spark, rows, budget):
    df = spark.createDataFrame(rows, "doc_id long, shard string, toks long")
    return pack_sequences(df, "toks", "doc_id", "shard", budget=budget)


def test_assignment_by_cumulative_start(spark):
    rows = [(i, "a", 100) for i in range(1, 5)]  # starts 0,100,200,300
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"]) for r in _packed(spark, rows, 250).collect()}
    assert got == {1: (0, 0), 2: (0, 100), 3: (0, 200), 4: (1, 50)}


def test_shards_pack_independently_and_oversized_docs_span(spark):
    rows = [
        (1, "a", 600),  # oversized: occupies starts [0,600) alone
        (2, "a", 10),  # starts at 600 → pack 2 (budget 256: 600//256=2)
        (1, "b", 5),
        (2, "b", 5),
    ]
    got = {(r["shard"], r["doc_id"]): r["pack_id"] for r in _packed(spark, rows, 256).collect()}
    assert got == {("a", 1): 0, ("a", 2): 2, ("b", 1): 0, ("b", 2): 0}


def test_stats_reconcile_with_assignment(spark):
    rows = [(i, "s", 64) for i in range(1, 10)]  # 9 docs × 64 toks, budget 256
    packed = _packed(spark, rows, 256)
    stats = {r["pack_id"]: (r["n_docs"], r["pack_tokens"], r["fill_ratio"]) for r in pack_stats(packed, "shard", budget=256).collect()}
    # 4 docs fill pack 0 exactly (256), next 4 fill pack 1, last doc starts pack 2
    assert stats == {0: (4, 256, 1.0), 1: (4, 256, 1.0), 2: (1, 64, 0.25)}
    assert sum(n for n, _, _ in stats.values()) == 9
