"""Deterministic splitting: reproducibility, stability under growth,
proportion accuracy, salt independence, cluster-level leakage safety."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.sampling import assign_split, leakage_safe_split
from scala_etl_test_spark.sources.parquet_source import read_table

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _assignment(df, id_col="doc_id"):
    return {r[id_col]: r["split"] for r in df.collect()}


def test_split_is_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = _assignment(assign_split(docs, "doc_id", WEIGHTS).select("doc_id", "split"))
    b = _assignment(assign_split(docs, "doc_id", WEIGHTS).select("doc_id", "split"))
    assert a == b


def test_split_stable_under_growth(spark, sf_dir):
    """A document's split must not change when the dataset grows — hash
    assignment depends only on the key, never on the cohort."""
    docs = read_table(spark, sf_dir, "documents")
    subset = docs.filter(F.col("doc_id") < 100)
    full = _assignment(assign_split(docs, "doc_id", WEIGHTS).select("doc_id", "split"))
    part = _assignment(assign_split(subset, "doc_id", WEIGHTS).select("doc_id", "split"))
    assert all(full[k] == v for k, v in part.items())


def test_split_proportions(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n = docs.count()
    counts = {
        r["split"]: r["count"]
        for r in assign_split(docs, "doc_id", WEIGHTS).groupBy("split").count().collect()
    }
    assert set(counts) <= set(WEIGHTS)
    for name, w in WEIGHTS.items():
        assert abs(counts.get(name, 0) / n - w) < 0.05, (name, counts)


def test_salt_gives_independent_split(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = _assignment(assign_split(docs, "doc_id", WEIGHTS).select("doc_id", "split"))
    b = _assignment(assign_split(docs, "doc_id", WEIGHTS, salt="exp2").select("doc_id", "split"))
    diff = sum(1 for k in a if a[k] != b[k])
    assert diff > 0.1 * len(a)  # a real resplit, not a copy


def test_bad_weights_raise(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, "doc_id", {"train": 0.5, "test": 0.2})


def test_leakage_safe_split_keeps_clusters_together(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in range(50)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (30, 31)], "id_a long, id_b long"
    )
    out = leakage_safe_split(df, pairs, "doc_id", WEIGHTS)
    got = _assignment(out.select("doc_id", "split"))
    for cluster in [(0, 1, 2), (10, 11), (20, 21, 22), (30, 31)]:
        assert len({got[i] for i in cluster}) == 1, (cluster, {i: got[i] for i in cluster})
    assert out.columns == ["doc_id", "text", "split"]


def test_stratified_sample_fixed_counts_and_stability(spark, sf_dir):
    """Exactly min(k, |stratum|) rows per stratum; membership is stable when
    other strata grow (content-addressed, not position-dependent)."""
    from pyspark.sql import functions as F

    from scala_etl_test_spark.operators.sampling import stratified_sample_fixed
    from scala_etl_test_spark.sources.parquet_source import read_table

    docs = read_table(spark, sf_dir, "documents")
    sample = stratified_sample_fixed(docs, "lang", "doc_id", k=5)
    per = {r["lang"]: r["n"] for r in sample.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {lang: min(5, n) for lang, n in sizes.items()}

    # growth in OTHER strata must not change this stratum's members
    en_before = {r["doc_id"] for r in sample.filter(F.col("lang") == "en").collect()}
    grown = docs.union(
        docs.filter(F.col("lang") == "fr").withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    en_after = {
        r["doc_id"]
        for r in stratified_sample_fixed(grown, "lang", "doc_id", k=5)
        .filter(F.col("lang") == "en")
        .collect()
    }
    assert en_before == en_after


def test_mixture_weights_sqrt_temperature(spark, sf_dir):
    """Weights sum to 1 and follow w ∝ √n: small sources get a larger share
    than their raw fraction, large sources a smaller one."""
    import math

    from scala_etl_test_spark.operators.sampling import mixture_weights
    from scala_etl_test_spark.sources.parquet_source import read_table

    docs = read_table(spark, sf_dir, "documents")
    rows = mixture_weights(docs, "source").collect()
    total = sum(r["n_docs"] for r in rows)
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-6
    denom = sum(math.sqrt(r["n_docs"]) for r in rows)
    for r in rows:
        assert abs(r["weight"] - math.sqrt(r["n_docs"]) / denom) < 1e-8
        raw_share = r["n_docs"] / total
        if raw_share < 1 / len(rows):
            assert r["weight"] >= raw_share  # upweighted


def test_weighted_sample_deterministic_and_monotone(spark):
    from scala_etl_test_spark.operators.sampling import weighted_sample

    df = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4 / 4.0).alias("w")
    )
    kept = {r["doc_id"] for r in weighted_sample(df, "w", "doc_id").collect()}
    # pure function of the key: identical under repartitioning and rerun
    again = {
        r["doc_id"]
        for r in weighted_sample(df.repartition(13), "w", "doc_id").collect()
    }
    assert kept == again
    # w=0 rows can never survive; keep rate grows with weight
    rates = {
        w: sum(1 for k in kept if k % 4 == w * 4) / 500 for w in (0.0, 0.25, 0.5, 0.75)
    }
    assert rates[0.0] == 0.0
    assert rates[0.25] < rates[0.5] < rates[0.75]
    assert rates[0.75] == pytest.approx(0.75, abs=0.06)


def test_weighted_sample_clamps(spark):
    from scala_etl_test_spark.operators.sampling import weighted_sample

    df = spark.range(0, 100).select(F.col("id").alias("doc_id"), F.lit(5.0).alias("w"))
    assert weighted_sample(df, "w", "doc_id").count() == 100  # p clamps to 1
    assert weighted_sample(df, "w", "doc_id", scale=-1.0).count() == 0  # p clamps to 0


def test_dsir_weights_prefer_target_like_docs(spark):
    from scala_etl_test_spark.operators.sampling import dsir_importance_weights

    rows = (
        [(i, "the cat sat on the mat and the dog ran", "en") for i in range(8)]
        + [(100 + i, "der hund lief und die katze sass auf der matte", "de") for i in range(8)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = df.filter("lang = 'en'")
    out = dsir_importance_weights(df, target, "text", "doc_id")
    got = {r["doc_id"]: r["log_weight"] for r in out.collect()}
    assert len(got) == 16
    en_avg = sum(got[i] for i in range(8)) / 8
    de_avg = sum(got[100 + i] for i in range(8)) / 8
    assert en_avg > de_avg  # target-domain docs must score higher


def test_dsir_weights_partition_invariant_and_empty_docs_absent(spark):
    from scala_etl_test_spark.operators.sampling import dsir_importance_weights

    rows = [(1, "alpha beta gamma", "en"), (2, "delta epsilon zeta", "de"), (3, "   ", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    target = df.filter("lang = 'en'")
    a = sorted(map(tuple, dsir_importance_weights(df, target, "text", "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            dsir_importance_weights(df.repartition(7), target, "text", "doc_id").collect(),
        )
    )
    assert a == b
    assert [r[0] for r in a] == [1, 2]  # whitespace-only doc 3 has no profile


class TestTokenBudget:
    def _alloc(self, spark, rows, budget):
        from scala_etl_test_spark.operators.sampling import token_budget_allocation

        df = spark.createDataFrame(rows, "src string, n long")
        return {
            r["src"]: (r["group_tokens"], r["alloc_tokens"])
            for r in token_budget_allocation(df, "src", "n", budget).collect()
        }

    def test_sums_exactly_to_budget(self, spark):
        rows = [("a", 333), ("b", 333), ("c", 334), ("a", 500)]
        got = self._alloc(spark, rows, 1000)
        assert sum(v[1] for v in got.values()) == 1000
        assert got["a"][0] == 833

    def test_matches_hamilton_reference(self, spark):
        rows = [("a", 7), ("b", 7), ("c", 2)]
        # quotas: 7/16*10=4.375, 4.375, 1.25 -> floors 4,4,1; leftover 1
        # remainders equal for a and b -> tie broken by group asc -> a
        got = self._alloc(spark, rows, 10)
        assert {k: v[1] for k, v in got.items()} == {"a": 5, "b": 4, "c": 1}

    def test_zero_budget(self, spark):
        got = self._alloc(spark, [("a", 5), ("b", 5)], 0)
        assert all(v[1] == 0 for v in got.values())

    def test_negative_budget_rejected(self, spark):
        from scala_etl_test_spark.operators.sampling import token_budget_allocation

        df = spark.createDataFrame([("a", 1)], "src string, n long")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            token_budget_allocation(df, "src", "n", -1)


def test_token_budget_no_int64_overflow(spark):
    """tokens×budget beyond int64 must still apportion exactly (decimal)."""
    from scala_etl_test_spark.operators.sampling import token_budget_allocation

    rows = [("a", 10_000_000_000), ("b", 30_000_000_000)]
    df = spark.createDataFrame(rows, "src string, n long")
    budget = 1_000_000_000
    got = {
        r["src"]: r["alloc_tokens"]
        for r in token_budget_allocation(df, "src", "n", budget).collect()
    }
    assert sum(got.values()) == budget
    assert got == {"a": 250_000_000, "b": 750_000_000}


class TestShardByHash:
    def test_range_and_determinism(self, spark):
        from scala_etl_test_spark.operators.sampling import shard_by_hash

        df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
        got = {r["doc_id"]: r["shard_id"] for r in shard_by_hash(df, "doc_id", 16).collect()}
        assert set(got) == set(range(200))
        assert all(0 <= s < 16 for s in got.values())
        assert len(set(got.values())) > 1  # spreads across shards
        again = {r["doc_id"]: r["shard_id"] for r in shard_by_hash(df, "doc_id", 16).collect()}
        assert got == again

    def test_growth_stable_membership(self, spark):
        """A doc keeps its shard when the corpus grows — content-addressed,
        not position-addressed."""
        from scala_etl_test_spark.operators.sampling import shard_by_hash

        small = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        big = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        s = {r["doc_id"]: r["shard_id"] for r in shard_by_hash(small, "doc_id", 8).collect()}
        b = {r["doc_id"]: r["shard_id"] for r in shard_by_hash(big, "doc_id", 8).collect()}
        assert all(b[k] == v for k, v in s.items())

    def test_invalid_shard_count_rejected(self, spark):
        import pytest as _pytest

        from scala_etl_test_spark.operators.sampling import shard_by_hash

        df = spark.createDataFrame([(1,)], "doc_id long")
        with _pytest.raises(ValueError):
            shard_by_hash(df, "doc_id", 0)
