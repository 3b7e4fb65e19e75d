from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_etl_test_spark.operators import dedup as D

DOCS = [
    # exact dup pair (after normalization: case/punct-insensitive)
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog!!"),
    # near-dup of 1 (one word changed)
    (3, "The quick brown fox jumps over the lazy cat"),
    # unrelated
    (4, "completely different content about spark engines and shuffles"),
    (5, "yet another unrelated document mentioning parquet and arrow"),
    # short doc (< shingle width)
    (6, "tiny doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_normalized(docs):
    out = D.exact_dedup(docs, "text", "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["fingerprint"] == by_id[2]["fingerprint"]
    assert not by_id[1]["is_duplicate"] and by_id[2]["is_duplicate"]
    assert by_id[2]["keep_id"] == 1
    assert by_id[3]["is_duplicate"] is False


def test_minhash_finds_near_dups_not_unrelated(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_near_duplicates(docs, "text", "doc_id", threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical shingle sets
    assert (1, 3) in pairs  # near-dup detected
    assert (4, 5) not in pairs  # unrelated not paired


def test_shingles_short_doc_fallback(spark, docs):
    row = docs.filter(F.col("doc_id") == 6).select(
        D.word_shingles("text", 3).alias("sh")
    ).first()
    assert row["sh"] == ["tiny doc"]


def test_simhash_close_for_near_dups(docs):
    fp = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, "text", "doc_id").collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(fp[1], fp[2]) == 0  # same token set
    assert ham(fp[1], fp[3]) < ham(fp[1], fp[4])  # near-dup closer than unrelated


def test_jaccard_pairs_exact_values(spark, docs):
    pairs = spark.createDataFrame([(1, 3)], ["id_a", "id_b"])
    out = D.jaccard_for_pairs(pairs, docs, "text", "doc_id").collect()
    # 9-word docs, 7 shingles each, differ in last word -> 6 common of 8 union
    assert len(out) == 1
    assert out[0]["jaccard"] == pytest.approx(6 / 8)


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    # 20 identical docs -> one bucket of 20; cap at 10 must drop all pairs
    many = spark.createDataFrame([(i, "same text everywhere here now") for i in range(20)], ["doc_id", "text"])
    sigs = D.minhash_signatures(many, "text", "doc_id")
    bands = D.lsh_bands(sigs, "doc_id")
    assert D.lsh_candidate_pairs(bands, "doc_id", max_bucket=10).count() == 0
    assert D.lsh_candidate_pairs(bands, "doc_id", max_bucket=100).count() == 20 * 19 / 2


def test_simhash_banded_equals_direct(spark, docs):
    from scala_etl_test_spark.operators.dedup import simhash, simhash_pairs, simhash_pairs_banded

    fp = simhash(docs, "text", "doc_id")
    direct = {tuple(r) for r in simhash_pairs(fp, "doc_id", max_hamming=6).collect()}
    banded = {tuple(r) for r in simhash_pairs_banded(fp, "doc_id", max_hamming=6).collect()}
    assert banded == direct


def test_incremental_dedup_matches_full_run(spark, sf_dir):
    """Splitting the corpus into (index, batch) and deduping the batch
    against the pre-built index must produce EXACTLY the full-run pairs
    that involve a batch id — index reuse cannot change the answer."""
    from pyspark.sql import functions as F

    from scala_etl_test_spark.operators.dedup import (
        build_minhash_index,
        incremental_near_duplicates,
        minhash_near_duplicates,
    )
    from scala_etl_test_spark.sources.parquet_source import read_table

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)

    kw = dict(num_hashes=16, bands=4, rows=4, shingle_n=3)
    shingles, bands_t = build_minhash_index(corpus, "text", "doc_id", **kw)
    got = {
        (r["id_a"], r["id_b"])
        for r in incremental_near_duplicates(
            batch, shingles, bands_t, "text", "doc_id", threshold=0.2, **kw
        ).collect()
    }

    full = minhash_near_duplicates(docs, "text", "doc_id", threshold=0.2, **kw)
    want = {
        (r["id_a"], r["id_b"])
        for r in full.collect()
        if r["id_a"] % 5 == 0 or r["id_b"] % 5 == 0
    }
    assert got == want
    assert got  # fixture must actually exercise cross-batch pairs


def test_build_vocab_partition_invariant(spark, sf_dir):
    """Vocabulary ids must be identical regardless of input partitioning
    (deterministic (occurrences DESC, word ASC) total order)."""
    from scala_etl_test_spark.operators.text import build_vocab
    from scala_etl_test_spark.sources.parquet_source import read_table

    docs = read_table(spark, sf_dir, "documents")
    v1 = {r["word"]: r["vocab_id"] for r in build_vocab(docs, "text", min_count=2, id_col="doc_id").collect()}
    v2 = {
        r["word"]: r["vocab_id"]
        for r in build_vocab(docs.repartition(13), "text", min_count=2, id_col="doc_id").collect()
    }
    assert v1 == v2 and len(v1) > 20
