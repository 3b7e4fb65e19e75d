"""Unit tests for substring-level dedup (operators/spans.py): duplicate-span
detection via k-gram islands, per-doc duplicated-fraction rollup, and
CCNet-style shared-chunk removal."""

from __future__ import annotations

import pytest

from scala_etl_test_spark.operators.spans import (
    chunk_dedup,
    duplicate_span_stats,
    duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_merges_into_one_maximal_span(spark):
    # docs 1 and 2 share the 6-word run "a b c d e f"; with k=4 that is
    # seeds at positions {0,1,2} in doc 1 (offset 2 in doc 2) — one island
    # each, covering the full 6-word span.
    docs = _docs(
        spark,
        [
            (1, "a b c d e f x y z w"),
            (2, "p q a b c d e f m n"),
            (3, "completely different words here indeed truly"),
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_spans(docs, k=4).collect()
    }
    assert spans == {(1, 0, 5, 6), (2, 2, 7, 6)}


def test_in_document_repetition_counts_as_duplicate(spark):
    # ExactSubstr convention: every occurrence counts, including repeats
    # within one document.
    docs = _docs(spark, [(1, "a b c d x x a b c d"), (2, "unrelated text entirely here")])
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, k=4).collect()
    }
    assert spans == {(1, 0, 3), (1, 6, 9)}


def test_docs_shorter_than_k_emit_nothing(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    assert duplicate_spans(docs, k=4).count() == 0
    # but at k <= doc length the identical docs are fully duplicated
    spans = {(r["doc_id"], r["span_start"], r["span_end"]) for r in duplicate_spans(docs, k=3).collect()}
    assert spans == {(1, 0, 2), (2, 0, 2)}


def test_two_separate_islands_stay_separate(spark):
    # shared prefix and shared suffix with a unique middle → two spans
    docs = _docs(
        spark,
        [
            (1, "a b c d UNIQ1 only here w x y z"),
            (2, "a b c d OTHER2 middle text w x y z"),
        ],
    )
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, k=4).collect()
    )
    assert (1, 0, 3) in got and (2, 0, 3) in got  # shared prefix
    assert (1, 7, 10) in got and (2, 7, 10) in got  # shared suffix
    assert len(got) == 4


def test_freq_modes_equivalent(spark, sf_dir):
    """The skew-robust agg mode and the single-shuffle window mode must
    produce identical spans — on crafted docs AND the real corpus."""
    crafted = _docs(
        spark,
        [
            (1, "a b c d e f x y z w"),
            (2, "p q a b c d e f m n"),
            (3, "a b c d x x a b c d"),
        ],
    )
    for docs in (crafted, spark.read.parquet(f"{sf_dir}/documents.parquet")):
        agg = {tuple(r) for r in duplicate_spans(docs, k=4, freq_mode="agg").collect()}
        win = {tuple(r) for r in duplicate_spans(docs, k=4, freq_mode="window").collect()}
        assert agg == win


def test_span_stats_overlapping_spans_union_coverage(spark):
    """Two maximal spans from islands closer than k overlap; dup_words must
    count the coverage UNION, never the length sum (dup_frac ≤ 1).

    doc 1 = w0..w9; doc 2 shares w0..w7, doc 3 shares w2..w9, nothing
    shares the full w0..w9 k-window span — with k=8 doc 1 gets duplicated
    seeds at pos 0 and 2 (pos 1 is unique), two islands, spans [0..7] and
    [2..9]: 10 distinct covered words, not 16."""
    d1 = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    docs = _docs(
        spark,
        [
            (1, d1),
            (2, "w0 w1 w2 w3 w4 w5 w6 w7"),
            (3, "w2 w3 w4 w5 w6 w7 w8 w9"),
        ],
    )
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_spans(docs, k=8).collect()
    }
    assert (1, 0, 7) in spans and (1, 2, 9) in spans
    rows = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(docs, k=8).collect()}
    assert rows[1]["n_spans"] == 2
    assert rows[1]["dup_words"] == 10
    assert rows[1]["dup_frac"] == 1.0


def test_span_stats_zero_for_clean_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),
            (3, "totally unique words that appear nowhere else at all"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in duplicate_span_stats(docs, k=4).collect()}
    assert rows[3]["n_spans"] == 0 and rows[3]["dup_words"] == 0 and rows[3]["dup_frac"] == 0.0
    assert rows[1]["dup_words"] == 8 and rows[1]["dup_frac"] == 1.0
    assert set(rows) == {1, 2, 3}  # every doc reports, spans or not


def test_chunk_dedup_removes_cross_doc_boilerplate_only(spark):
    # chunk width 2: "FOO BAR" is shared across docs 1 and 2 → removed from
    # both; "x x" repeated within doc 3 only → kept (distinct-doc count 1).
    docs = _docs(
        spark,
        [
            (1, "FOO BAR alpha beta"),
            (2, "FOO BAR gamma delta"),
            (3, "x x x x"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in chunk_dedup(docs, chunk_words=2).collect()}
    assert rows[1]["clean_text"] == "alpha beta" and rows[1]["n_kept"] == 1
    assert rows[2]["clean_text"] == "gamma delta" and rows[2]["n_chunks"] == 2
    assert rows[3]["clean_text"] == "x x x x" and rows[3]["n_kept"] == 2


def test_chunk_dedup_fully_boilerplate_doc_survives_empty(spark):
    docs = _docs(spark, [(1, "FOO BAR"), (2, "FOO BAR"), (3, "other words")])
    rows = {r["doc_id"]: r.asDict() for r in chunk_dedup(docs, chunk_words=2).collect()}
    assert rows[1]["clean_text"] == "" and rows[1]["n_kept"] == 0 and rows[1]["n_chunks"] == 1
    assert rows[3]["clean_text"] == "other words"


def test_chunk_dedup_reassembles_in_order(spark):
    # doc 1: four chunks, second and fourth shared with doc 2 → surviving
    # chunks must re-join in original order
    docs = _docs(
        spark,
        [
            (1, "k1 k1 SH1 SH1 k2 k2 SH2 SH2"),
            (2, "SH1 SH1 zz zz SH2 SH2"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in chunk_dedup(docs, chunk_words=2).collect()}
    assert rows[1]["clean_text"] == "k1 k1 k2 k2"
    assert rows[2]["clean_text"] == "zz zz"


def test_incremental_spans_match_full_run(spark, sf_dir):
    """Batch spans against the gram index == full-run spans restricted to
    batch ids — on the real corpus, split at an arbitrary boundary, plus a
    second absorbed batch."""
    from scala_etl_test_spark.operators.spans import (
        build_gram_index,
        incremental_duplicate_spans,
        merge_gram_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = docs.filter("doc_id % 5 != 0")
    batch1 = docs.filter("doc_id % 10 == 0")
    batch2 = docs.filter("doc_id % 10 == 5")

    idx = build_gram_index(seed, k=4).localCheckpoint()
    got1 = {
        tuple(r)
        for r in incremental_duplicate_spans(batch1, idx, k=4).collect()
    }
    full1 = {
        tuple(r)
        for r in duplicate_spans(seed.unionByName(batch1), k=4)
        .join(batch1.select("doc_id"), on="doc_id", how="left_semi")
        .collect()
    }
    assert got1 == full1 and got1  # non-vacuous: the corpus has near-dups

    # absorb batch1, then batch2 must see corpus = seed ∪ batch1
    idx2 = merge_gram_index(idx, build_gram_index(batch1, k=4)).localCheckpoint()
    got2 = {
        tuple(r)
        for r in incremental_duplicate_spans(batch2, idx2, k=4).collect()
    }
    full2 = {
        tuple(r)
        for r in duplicate_spans(docs, k=4)
        .join(batch2.select("doc_id"), on="doc_id", how="left_semi")
        .collect()
    }
    assert got2 == full2


def test_unigram_lm_scores_hand_computed(spark):
    import math

    from scala_etl_test_spark.operators.text import unigram_lm_scores

    # corpus: a×3, b×1 → p(a)=3/4, p(b)=1/4
    docs = _docs(spark, [(1, "a a a"), (2, "b")])
    rows = {r["doc_id"]: r.asDict() for r in unigram_lm_scores(docs, "text", "doc_id").collect()}
    assert rows[1]["n_words"] == 3
    assert rows[1]["avg_neg_log2_p"] == pytest.approx(-math.log2(3 / 4), abs=1e-6)
    assert rows[2]["avg_neg_log2_p"] == pytest.approx(2.0, abs=1e-9)  # -log2(1/4)


class TestCdcChunkDedup:
    def test_shift_resistance_vs_fixed_windows(self, spark):
        """The defining property: prepend ONE word to a shared document and
        fixed windows lose (nearly) every chunk alignment, while
        content-defined boundaries re-synchronize and still dedup the
        unchanged tail."""
        import random

        from scala_etl_test_spark.operators.spans import cdc_chunk_dedup, chunk_dedup

        rng = random.Random(3)
        vocab = [f"w{i}" for i in range(50)]
        body = " ".join(rng.choice(vocab) for _ in range(120))
        rows = [(1, body), (2, "zzz " + body)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        fixed = {r["doc_id"]: r for r in chunk_dedup(df, "text", "doc_id").collect()}
        cdc = {r["doc_id"]: r for r in cdc_chunk_dedup(df, "text", "doc_id").collect()}
        fixed_removed = sum(r["n_chunks"] - r["n_kept"] for r in fixed.values())
        cdc_removed = sum(r["n_chunks"] - r["n_kept"] for r in cdc.values())
        # fixed windows: the leading insertion slides every window -> almost
        # nothing matches; CDC: boundaries resync -> most chunks dedup
        assert cdc_removed > fixed_removed
        assert cdc_removed >= cdc[1]["n_chunks"] - 2  # all but the head region

    def test_identical_docs_fully_boilerplate(self, spark):
        from scala_etl_test_spark.operators.spans import cdc_chunk_dedup

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in cdc_chunk_dedup(df, "text", "doc_id").collect()}
        for r in out.values():
            assert r["n_kept"] == 0 and r["clean_text"] == ""

    def test_chunks_partition_the_document(self, spark):
        # reassembling ALL chunks (min_docs high => nothing removed)
        # reproduces the normalized text exactly
        from scala_etl_test_spark.operators.dedup import normalize_text
        from scala_etl_test_spark.operators.spans import cdc_chunk_dedup
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, "The quick brown fox JUMPED over 2 lazy dogs!")], ["doc_id", "text"]
        )
        out = cdc_chunk_dedup(df, "text", "doc_id", min_docs=99).collect()[0]
        want = df.select(normalize_text("text").alias("n")).collect()[0]["n"]
        assert out["clean_text"] == want
        assert out["n_kept"] == out["n_chunks"]
