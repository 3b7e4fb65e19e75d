from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_etl_test_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat of the mat in a house"),
        (2, "der hund und die katze sind nicht ein problem"),
        (3, "le chat et la maison des les animaux est grande"),
        (4, "xyzzy qwerty plugh"),  # no markers -> und
        (5, "numbers 123 and punctuation!!! %% everywhere 456"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lang_id_markers(docs):
    got = {r["doc_id"]: r["pl"] for r in docs.select("doc_id", X.lang_id("text").alias("pl")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"


def test_text_stats_ratios(docs):
    out = {r["doc_id"]: r for r in X.text_stats(docs, "text", "doc_id").collect()}
    r1 = out[1]
    assert r1["n_words"] == 12
    assert r1["stop_ratio"] > 0.3  # 'the' x3, 'and', 'of', 'in', 'a'
    assert r1["punct_ratio"] == 0.0
    assert r1["quality_score"] == 1.0
    r5 = out[5]
    assert r5["digit_ratio"] > 0
    assert r5["punct_ratio"] > 0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world 42!")], ["doc_id", "text"])
    row = X.token_counts(df, "text", "doc_id").first()
    assert row["ws_tokens"] == 3
    # re tokens: hello, world, 4, 2, !
    assert row["re_tokens"] == 5
    assert row["chars"] == 15


def test_fingerprint_stable_under_case_punct(spark):
    df = spark.createDataFrame(
        [(1, "The Quick, Brown Fox! jumps over it"), (2, "the quick brown fox jumps over it")],
        ["doc_id", "text"],
    )
    out = X.document_fingerprints(df, "text", "doc_id").collect()
    assert out[0]["fingerprint"] == out[1]["fingerprint"]
    assert out[0]["min_shingle_hash"] == out[1]["min_shingle_hash"]


def test_repetition_metrics_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a b"),  # top uni 4/5, bigrams: 'a a'x3 + 'a b' -> 3/4
            # 10 distinct words: top uni 1/10, top bigram 1/9 — both under gate
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "solo"),  # single word: no bigrams -> NULL frac, not repetitive
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in X.repetition_metrics(df, "text", "doc_id").collect()}
    assert got[1]["n_words"] == 5
    assert got[1]["top_unigram_frac"] == 0.8
    assert got[1]["top_bigram_frac"] == 0.75
    assert got[1]["distinct_word_frac"] == 0.4
    assert got[1]["repetitive"]
    assert got[2]["top_unigram_frac"] == 0.1
    assert got[2]["distinct_word_frac"] == 1.0
    assert not got[2]["repetitive"]
    assert got[3]["top_bigram_frac"] is None
    # a single-word doc is 100% its own top unigram — degenerate docs are
    # the length gate's job (text_stats length_ok), not this metric's
    assert got[3]["repetitive"]


def test_null_and_empty_text_drop_out_of_repetition_metrics(spark):
    """NULL text explodes to no rows (split(NULL) → NULL → explode drops);
    empty text normalizes to [''] which the word filter removes. Both
    vanish from the output — identical to the oracle's unnest(NULL)/filter
    semantics — rather than crashing or producing zero-division rows."""
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "real words here")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in X.repetition_metrics(df, "text", "doc_id").collect()}
    assert got == {3}


def test_tokenize_long_positions_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "unknownword the")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame(
        [("the", 0), ("cat", 1), ("hat", 2)], "word string, vocab_id long"
    )
    got = {
        (r["doc_id"], r["pos"]): (r["word"], r["token_id"])
        for r in X.tokenize_long(docs, vocab, "text", "doc_id").collect()
    }
    assert got == {
        (1, 0): ("the", 0), (1, 1): ("cat", 1), (1, 2): ("the", 0), (1, 3): ("hat", 2),
        (2, 0): ("unknownword", -1), (2, 1): ("the", 0),
    }


def test_bigram_lm_scores_closed_form(spark):
    import math

    # corpus: "a b a b" and "a b c"; V = 3
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in X.bigram_lm_scores(df, "text", "doc_id").collect()}
    assert set(got) == {1, 2}  # doc 3 has no bigrams
    # counts over all bigrams: (a,b):3, (b,a):1, (b,c):1; context: a:3, b:2
    v = 4  # distinct words: a b c x
    p_ab = (3 + 1) / (3 + v)
    p_ba = (1 + 1) / (2 + v)
    p_bc = (1 + 1) / (2 + v)
    exp1 = -(math.log2(p_ab) * 2 + math.log2(p_ba)) / 3
    exp2 = -(math.log2(p_ab) + math.log2(p_bc)) / 2
    assert got[1]["n_bigrams"] == 3
    assert got[1]["avg_neg_log2_p"] == pytest.approx(exp1, abs=1e-6)
    assert got[2]["avg_neg_log2_p"] == pytest.approx(exp2, abs=1e-6)
    # transitions seen more often are less surprising
    assert got[1]["avg_neg_log2_p"] < got[2]["avg_neg_log2_p"]


# ---------------------------------------------------------------------------
# winnowing (Schleimer et al. 2003)
# ---------------------------------------------------------------------------


def _winnow(spark, rows, k=3, w=3):
    from scala_etl_test_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(df, "text", "doc_id", k=k, w=w)


def test_winnow_shared_run_guarantee(spark):
    # the winnowing guarantee: a shared word run of length >= w + k - 1
    # (here 3 + 3 - 1 = 5) must produce at least one shared fingerprint
    shared = "alpha beta gamma delta epsilon"
    rows = [(1, f"one two {shared} three"), (2, f"{shared} nine eight seven six")]
    out = _winnow(spark, rows).collect()
    fps = {1: set(), 2: set()}
    for r in out:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared >=w+k-1 run must share a fingerprint"


def test_winnow_short_doc_single_window(spark):
    # >= k words but fewer than w grams: one window over all grams -> the
    # single global minimum is selected
    out = _winnow(spark, [(1, "aaa bbb ccc dd")], k=3, w=4).collect()  # 2 grams < w
    assert len(out) == 1


def test_winnow_below_k_words_emits_nothing(spark):
    assert _winnow(spark, [(1, "one two")], k=3, w=3).count() == 0


def test_winnow_rightmost_tie_break(spark):
    # identical grams everywhere (all words equal): every window's min is
    # the same hash and the RIGHTMOST occurrence must win -> selected
    # positions are the last gram of each window, deduped
    out = _winnow(spark, [(1, "x x x x x x")], k=2, w=3).collect()  # 5 identical grams
    assert len({r["fp"] for r in out}) == 1
    # windows [0..2],[1..3],[2..4] -> rightmost positions {2, 3, 4}
    assert sorted(r["pos"] for r in out) == [2, 3, 4]


def test_winnow_density_bound(spark):
    # ~2/(w+1) density: far fewer fingerprints than grams on real-ish text
    words_ = " ".join(f"w{i * 7919 % 1000}" for i in range(200))
    out = _winnow(spark, [(1, words_)], k=5, w=8).collect()
    n_grams = 200 - 5 + 1
    assert 0 < len(out) < n_grams / 2


def test_winnow_overlap_pairs_cap_and_threshold(spark):
    from scala_etl_test_spark.operators.text import winnow_fingerprints, winnow_overlap_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"{shared} unique one piece"),
        (2, f"{shared} other tail words"),
        (3, "completely different content with no run in common here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnow_fingerprints(df, "text", "doc_id", k=3, w=3)
    pairs = winnow_overlap_pairs(fps, "doc_id", min_shared=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["n_shared"] >= 2 for r in pairs)
    # a cap of 1 drops every shared fingerprint bucket -> no pairs survive
    assert winnow_overlap_pairs(fps, "doc_id", min_shared=1, max_bucket=1).count() == 0


class TestNegativeSamplingTable:
    def test_ranges_partition_table_and_scale_with_smoothed_counts(self, spark):
        from scala_etl_test_spark.operators.text import negative_sampling_table

        rows = [(0, "a " * 81 + "b " * 16 + "c")]  # counts 81, 16, 1
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            negative_sampling_table(df, "text", table_size=1000).collect(),
            key=lambda r: r["slot_start"],
        )
        # half-open ranges tile [0, 1000) in (count desc, word) order
        assert got[0]["slot_start"] == 0
        assert got[-1]["slot_end"] == 1000
        for prev, cur in zip(got, got[1:]):
            assert prev["slot_end"] == cur["slot_start"]
        # 81^0.75=27, 16^0.75=8, 1^0.75=1 -> shares 27/36, 8/36, 1/36
        by_word = {r["word"]: r["slot_end"] - r["slot_start"] for r in got}
        assert abs(by_word["a"] - 750) <= 1
        assert abs(by_word["b"] - 222) <= 1
        assert abs(by_word["c"] - 28) <= 1

    def test_partitioning_invariant(self, spark):
        from scala_etl_test_spark.operators.text import negative_sampling_table

        rows = [(i, "x y z " * (i % 7 + 1)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = {tuple(r) for r in negative_sampling_table(df, "text").collect()}
        b = {
            tuple(r)
            for r in negative_sampling_table(df.repartition(9), "text").collect()
        }
        assert a == b


def test_negative_sampling_huge_counts_no_wraparound(spark):
    """n³ beyond int64 (n > 2.1e6) must not wrap to NaN weights."""
    from scala_etl_test_spark.operators.text import negative_sampling_table
    from pyspark.sql import functions as F

    counts = spark.createDataFrame(
        [("big", 5_000_000), ("small", 100)], "word string, n_word long"
    )
    # drive the operator's internals directly on a counts table by
    # synthesizing docs is impractical at this count; replicate the weight
    # expression and assert it is finite and ordered
    c = F.col("n_word").cast("double")
    w = counts.select(
        "word", F.round(F.sqrt(F.sqrt(c * c * c)) * 1_000_000, 0).cast("long").alias("wq")
    ).collect()
    by = {r["word"]: r["wq"] for r in w}
    assert by["big"] > by["small"] > 0
    assert by["big"] == round(5_000_000**0.75 * 1_000_000)


class TestQualityFilterSweep:
    def test_retention_monotone_and_shares(self, docs):
        out = {r["threshold"]: r for r in X.quality_filter_sweep(docs, "text").collect()}
        assert set(out) == {0.0, 0.25, 0.5, 0.75, 1.0}
        # threshold 0 retains everything
        assert out[0.0]["n_docs"] == 5
        assert out[0.0]["doc_share"] == 1.0
        assert out[0.0]["char_share"] == 1.0
        total_chars = out[0.0]["n_chars_retained"]
        # retention is non-increasing in the threshold
        ordered = [out[t] for t in sorted(out)]
        for lo, hi in zip(ordered, ordered[1:]):
            assert hi["n_docs"] <= lo["n_docs"]
            assert hi["n_chars_retained"] <= lo["n_chars_retained"]
        # doc 1 scores 1.0 (see test_text_stats_ratios) so the top bucket
        # keeps at least that doc, and shares stay consistent with counts
        assert out[1.0]["n_docs"] >= 1
        assert out[1.0]["char_share"] == round(out[1.0]["n_chars_retained"] / total_chars, 6)

    def test_empty_threshold_rows_survive(self, spark):
        # a corpus where nothing reaches 1.0 still emits every threshold row
        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        out = {r["threshold"]: r for r in X.quality_filter_sweep(df, "text").collect()}
        assert set(out) == {0.0, 0.25, 0.5, 0.75, 1.0}
        assert out[1.0]["n_docs"] == 0
        assert out[1.0]["doc_share"] == 0.0


class TestOovRate:
    def test_oov_against_reference_half(self, spark):
        rows = [
            (0, "alpha beta gamma", "s1"),   # ref: vocab = {alpha beta gamma delta}
            (2, "delta alpha", "s1"),        # ref
            (1, "alpha novel beta", "s1"),   # non-ref: 'novel' is OOV
            (3, "unseen tokens only here", "s2"),  # non-ref, fully OOV
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {r["source"]: r for r in X.oov_rate(df, "text", "source", (F.col("doc_id") % 2) == 0).collect()}
        s1 = out["s1"]
        # s1: 8 occurrences, 1 OOV ('novel'); 5 types, 1 OOV type
        assert s1["n_tokens"] == 8 and s1["n_oov_tokens"] == 1
        assert s1["oov_token_rate"] == round(1 / 8, 6)
        assert s1["n_types"] == 5 and s1["n_oov_types"] == 1
        s2 = out["s2"]
        assert s2["oov_token_rate"] == 1.0 and s2["oov_type_rate"] == 1.0

    def test_vocab_is_global_across_groups(self, spark):
        # a word referenced only in ANOTHER group's ref half is still in-vocab
        rows = [(0, "shared word", "a"), (1, "shared other", "b")]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {r["source"]: r for r in X.oov_rate(df, "text", "source", (F.col("doc_id") % 2) == 0).collect()}
        assert out["b"]["n_oov_tokens"] == 1  # 'other' OOV, 'shared' covered by a's ref doc
