"""Model scoring hook: deterministic fake scores, gated real model, and the
Python normalization twin staying byte-identical to the engine contract."""

from __future__ import annotations

import pytest

from scala_etl_test_spark.operators.scoring import (
    _normalize,
    fake_model_score,
    score_documents,
)


def test_fake_scores_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "Some Text, with Punct!"), (2, "some text with punct"), (3, "other")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["model_score"] for r in score_documents(df, "text", "doc_id").collect()}
    # normalization-invariant: docs 1 and 2 normalize identically
    assert got[1] == got[2] == fake_model_score("Some Text, with Punct!")
    assert got[1] != got[3]
    assert all(0.0 <= s < 1.0 for s in got.values())


def test_python_normalization_matches_engine_contract(spark):
    """The pandas-side normalizer must be byte-identical to normalize_text
    (the _NORM_SQL contract) — a drifting third implementation would break
    the oracle silently."""
    from pyspark.sql import functions as F

    from scala_etl_test_spark.operators.dedup import normalize_text

    rows = ["  MiXeD   CaSe \t 123!@#abc ", "", "déjà vu", "a-b_c.d", "ALL CAPS 42"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "i long, text string")
    engine = {r["i"]: r["n"] for r in df.select("i", normalize_text("text").alias("n")).collect()}
    for i, t in enumerate(rows):
        assert _normalize(t) == engine[i], (t, _normalize(t), engine[i])


def test_null_text_propagates_null_score(spark):
    """NULL in → NULL out, matching the oracle's md5(NULL) = NULL — the
    operator must not invent a score for missing text."""
    df = spark.createDataFrame([(1, None), (2, "real")], "doc_id long, text string")
    got = {r["doc_id"]: r["model_score"] for r in score_documents(df, "text", "doc_id").collect()}
    assert got[1] is None and got[2] is not None


def test_id_col_name_is_preserved(spark):
    df = spark.createDataFrame([(7, "x")], "media_id long, text string")
    out = score_documents(df, "text", id_col="media_id")
    assert out.columns == ["media_id", "model_score"]
    assert out.collect()[0]["media_id"] == 7


def test_real_model_gated(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError, match="fasttext unavailable"):
        score_documents(df, "text", "doc_id", model="fasttext", model_path="/nope.bin")


class TestPmiCollocations:
    def test_planted_phrase_tops_ranking(self, spark):
        from scala_etl_test_spark.operators.text import pmi_collocations

        # "neural network" always adjacent; filler words independent
        rows = [
            (i, "neural network " + " ".join(["the", "data", "model", "train"][j % 4] for j in range(i % 5 + 3)))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = pmi_collocations(df, "text", min_count=5, top_n=5).collect()
        assert (got[0]["w1"], got[0]["w2"]) == ("neural", "network")
        assert got[0]["n_pair"] == 40
        # ordering is (pmi desc, w1, w2)
        pmis = [r["pmi"] for r in got]
        assert pmis == sorted(pmis, reverse=True)

    def test_min_count_suppresses_tail(self, spark):
        from scala_etl_test_spark.operators.text import pmi_collocations

        rows = [(0, "rare pair"), (1, "common words common words common words")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = pmi_collocations(df, "text", min_count=2, top_n=10).collect()
        assert ("rare", "pair") not in {(r["w1"], r["w2"]) for r in got}

    def test_single_word_docs_contribute_no_bigrams(self, spark):
        from scala_etl_test_spark.operators.text import pmi_collocations

        rows = [(i, "solo") for i in range(10)] + [(100, "a b a b a b a b a b")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = pmi_collocations(df, "text", min_count=1, top_n=10).collect()
        pairs = {(r["w1"], r["w2"]) for r in got}
        assert all("solo" not in p for p in pairs)
