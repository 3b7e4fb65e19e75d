from __future__ import annotations

import math

import pytest

from scala_etl_test_spark.operators.retrieval import BM25_B, BM25_K1, bm25_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark spark spark"),  # high tf for one term, short doc
        (2, "spark join vector"),  # one hit per term
        (3, "join join join join join join join join join join"),  # long doc
        (4, "nothing relevant here at all"),  # no query terms -> excluded
        (5, ""),  # empty -> excluded
        (6, "vector"),  # single-word doc
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _bm25_ref(tf: int, dl: int, avgdl: float, df: int, n: int) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (BM25_K1 + 1.0) / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))


def test_bm25_matches_closed_form(docs):
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["spark", "join", "vector"], k=10).collect()}
    # docs 4 and 5 match no query term and must be excluded
    assert set(out) == {1, 2, 3, 6}
    n, avgdl = 6, (3 + 3 + 10 + 5 + 0 + 1) / 6
    expect2 = sum(_bm25_ref(1, 3, avgdl, df, n) for df in (2, 2, 2))
    assert out[2]["bm25"] == pytest.approx(expect2, abs=1e-6)
    expect1 = _bm25_ref(3, 3, avgdl, 2, n)
    assert out[1]["bm25"] == pytest.approx(expect1, abs=1e-6)


def test_bm25_rank_is_dense_and_ordered(docs):
    rows = bm25_topk(docs, ["spark", "join", "vector"], k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_empty_terms_rejected(docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_hybrid_rrf_semantics(spark, sf_dir):
    """Docs in both lists outrank docs in one; ranks and fusion agree with
    a driver-side recomputation."""
    from scala_etl_test_spark.plans.queries_data import (
        q_ann_cosine_topk,
        q_bm25_topk,
        q_hybrid_retrieval,
    )

    sparse = {r["doc_id"]: r["rank"] for r in q_bm25_topk(spark, sf_dir).collect()}
    dense_rows = q_ann_cosine_topk(spark, sf_dir).collect()
    dense = {
        r["vec_id"]: i + 1
        for i, r in enumerate(
            sorted(dense_rows, key=lambda r: (-r["cosine"], r["vec_id"]))
        )
    }
    expect = {}
    for d in set(sparse) | set(dense):
        expect[d] = round(
            (1.0 / (60 + sparse[d]) if d in sparse else 0.0)
            + (1.0 / (60 + dense[d]) if d in dense else 0.0),
            6,
        )
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["doc_id"], r["rrf"]) for r in q_hybrid_retrieval(spark, sf_dir).collect()]
    assert got == top
