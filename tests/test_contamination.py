"""Decontamination: verbatim n-gram overlap with the benchmark set is
flagged with exact shared-gram and implicated-doc counts; clean docs pass."""

from __future__ import annotations

from scala_etl_test_spark.operators.contamination import ngram_contamination


def test_overlap_counts_and_clean_docs(spark):
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "pack my box with five dozen liquor jugs"),
        ],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains bench 100's first 5-gram verbatim (1 shared shingle)
            (1, "intro words the quick brown fox jumps and more trailing text"),
            # verbatim copy of bench 101 → all 4 of its 5-grams shared
            (2, "pack my box with five dozen liquor jugs"),
            # no 5-gram overlap
            (3, "completely unrelated content with no shared phrases at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_benchmark_docs"])
        for r in ngram_contamination(corpus, bench, "text", "doc_id", n=5).collect()
    }
    assert got == {1: (1, 1), 2: (4, 1)}


def test_min_shared_threshold(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "zzz one two three four five yyy")], "doc_id long, text string"
    )
    # doc 1 shares exactly 1 distinct 5-gram; min_shared=2 filters it out
    assert ngram_contamination(corpus, bench, "text", "doc_id", n=5, min_shared=2).count() == 0
    assert ngram_contamination(corpus, bench, "text", "doc_id", n=5).count() == 1


class TestBloomDecontaminate:
    def _dfs(self, spark):
        bench = spark.createDataFrame(
            [(100, "the secret eval question about spark internals one two")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (1, "totally clean document with its own words entirely"),
                (2, "contains the secret eval question about spark internals verbatim"),
                (3, "another clean one nothing shared with the benchmark set"),
            ],
            "doc_id long, text string",
        )
        return corpus, bench

    def test_superset_of_exact_and_flags_contaminated(self, spark):
        from scala_etl_test_spark.operators.contamination import (
            bloom_decontaminate,
            ngram_contamination,
        )

        corpus, bench = self._dfs(spark)
        exact = {r["doc_id"] for r in ngram_contamination(corpus, bench, "text", "doc_id").collect()}
        bloom = {r["doc_id"] for r in bloom_decontaminate(corpus, bench, "text", "doc_id").collect()}
        assert 2 in exact
        assert exact <= bloom  # the one-sided guarantee

    def test_tiny_filter_still_no_false_negatives(self, spark):
        """Even a pathologically small filter (every probe collides) keeps
        the no-false-negative guarantee — it only over-flags."""
        from scala_etl_test_spark.operators.contamination import (
            bloom_decontaminate,
            ngram_contamination,
        )

        corpus, bench = self._dfs(spark)
        exact = {r["doc_id"] for r in ngram_contamination(corpus, bench, "text", "doc_id").collect()}
        tiny = {r["doc_id"] for r in bloom_decontaminate(
            corpus, bench, "text", "doc_id", m_bits=2
        ).collect()}
        assert exact <= tiny
        assert tiny == {1, 2, 3}  # m=2 bits: everything collides -> all flagged


class TestCrossSourceOverlap:
    def test_matrix_counts_and_zero_pairs(self, spark):
        from scala_etl_test_spark.operators.contamination import cross_source_overlap

        rows = [
            (1, "alpha beta gamma delta common tail words here", "s1"),
            (2, "alpha beta gamma delta other ending entirely now", "s2"),
            (3, "totally disjoint vocabulary nothing shared at all ever", "s3"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = {(r["source_a"], r["source_b"]): r for r in cross_source_overlap(df, "text", "source", shingle_n=4).collect()}
        # full matrix: C(3,2) pairs, zero-overlap pairs included
        assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
        # s1/s2 share exactly the 4-gram 'alpha beta gamma delta'
        assert out[("s1", "s2")]["n_shared_shingles"] == 1
        # each doc has 5 distinct 4-grams -> jaccard 1/9
        assert out[("s1", "s2")]["jaccard"] == round(1 / 9, 6)
        assert out[("s1", "s3")]["n_shared_shingles"] == 0
        assert out[("s1", "s3")]["jaccard"] == 0.0

    def test_short_docs_fall_back_to_whole_text(self, spark):
        from scala_etl_test_spark.operators.contamination import cross_source_overlap

        rows = [(1, "tiny doc", "a"), (2, "tiny doc", "b")]
        df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        out = cross_source_overlap(df, "text", "source", shingle_n=5).collect()
        assert len(out) == 1
        assert out[0]["n_shared_shingles"] == 1
        assert out[0]["jaccard"] == 1.0


class TestSplitLeakageAudit:
    """split_leakage_audit: straddled near-dup pairs per split pair, with
    normalized split names and per-side distinct doc counts."""

    def _audit(self, spark, assignments, pairs):
        from scala_etl_test_spark.operators.contamination import split_leakage_audit

        a = spark.createDataFrame(assignments, "doc_id long, split string")
        p = spark.createDataFrame(pairs, "id_a long, id_b long")
        return {
            (r["split_a"], r["split_b"]): (r["n_pairs"], r["n_docs_a"], r["n_docs_b"])
            for r in split_leakage_audit(a, p).collect()
        }

    def test_straddled_pairs_counted_same_split_excluded(self, spark):
        assignments = [(1, "train"), (2, "test"), (3, "train"), (4, "val"), (5, "train")]
        pairs = [(1, 2), (1, 3), (2, 4), (4, 5)]
        got = self._audit(spark, assignments, pairs)
        # (1,3) is train/train → not a leak; names normalize lexicographically
        assert got == {
            ("test", "train"): (1, 1, 1),
            ("test", "val"): (1, 1, 1),
            ("train", "val"): (1, 1, 1),
        }

    def test_distinct_doc_counts_vs_pair_counts(self, spark):
        # one train doc near-dups THREE test docs: 3 pairs, 1 train doc
        assignments = [(1, "train"), (2, "test"), (3, "test"), (4, "test")]
        pairs = [(1, 2), (1, 3), (1, 4)]
        got = self._audit(spark, assignments, pairs)
        assert got == {("test", "train"): (3, 3, 1)}

    def test_leakage_safe_split_audits_clean(self, spark):
        """The by-cluster split's audit is EMPTY for every pair list, and
        the naive by-doc split leaks on a crafted cross-split pair."""
        from scala_etl_test_spark.operators.contamination import split_leakage_audit
        from scala_etl_test_spark.operators.sampling import assign_split, leakage_safe_split

        docs = spark.createDataFrame([(i,) for i in range(1, 61)], "doc_id long")
        weights = {"train": 0.5, "val": 0.25, "test": 0.25}
        naive = assign_split(docs, "doc_id", weights)
        by_split = {r["doc_id"]: r["split"] for r in naive.collect()}
        # craft a pair that straddles the naive split (ids exist: 60 ids
        # across 3 splits always yield a cross-split pair)
        id_a = next(i for i in by_split if by_split[i] == "train")
        id_b = next(i for i in by_split if by_split[i] != "train")
        pairs = spark.createDataFrame([(min(id_a, id_b), max(id_a, id_b))], "id_a long, id_b long")
        assert split_leakage_audit(naive, pairs).count() == 1
        safe = leakage_safe_split(docs, pairs, "doc_id", weights)
        assert split_leakage_audit(safe, pairs).count() == 0

    def test_randomized_vs_python_reference(self, spark):
        """Seeded-random cross-check against an independent Python
        reference (same pattern as the CC union-find property): pair
        counts, normalization, and per-side distinct doc counts."""
        import random
        from collections import defaultdict

        from scala_etl_test_spark.operators.contamination import split_leakage_audit

        rng = random.Random(909)
        for _ in range(3):
            n = 40
            splits = {i: rng.choice(["train", "val", "test"]) for i in range(n)}
            pairs = set()
            while len(pairs) < 25:
                a, b = rng.sample(range(n), 2)
                pairs.add((min(a, b), max(a, b)))
            ref: dict = defaultdict(lambda: [0, set(), set()])
            for a, b in sorted(pairs):
                sa, sb = splits[a], splits[b]
                if sa == sb:
                    continue
                lo, hi = (sa, sb) if sa < sb else (sb, sa)
                da, db = (a, b) if sa < sb else (b, a)
                e = ref[(lo, hi)]
                e[0] += 1
                e[1].add(da)
                e[2].add(db)
            want = {k: (v[0], len(v[1]), len(v[2])) for k, v in ref.items()}
            a_df = spark.createDataFrame(sorted(splits.items()), "doc_id long, split string")
            p_df = spark.createDataFrame(sorted(pairs), "id_a long, id_b long")
            got = {
                (r["split_a"], r["split_b"]): (r["n_pairs"], r["n_docs_a"], r["n_docs_b"])
                for r in split_leakage_audit(a_df, p_df).collect()
            }
            assert got == want
