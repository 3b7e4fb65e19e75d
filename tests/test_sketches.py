"""CMS heavy hitters: guarantees hold, adversarial skew, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.sketches import cms_heavy_hitters


def test_heavy_hitters_exact_and_bounded(spark):
    rows = [(i % 7,) for i in range(7000)] + [(99,)] * 500
    df = spark.createDataFrame(rows, "user_id long")
    got = cms_heavy_hitters(df, "user_id", top_n=3, eps=0.01).collect()
    assert [(r["key"], r["exact_count"]) for r in got] == [
        (0, 1000),
        (1, 1000),
        (2, 1000),
    ]
    assert all(r["within_bound"] for r in got)


def test_skewed_stream_top1(spark):
    rows = [(1,)] * 5000 + [(i,) for i in range(2, 500)]
    df = spark.createDataFrame(rows, "user_id long").repartition(8)
    got = cms_heavy_hitters(df, "user_id", top_n=1, eps=0.001).collect()
    assert got[0]["key"] == 1 and got[0]["exact_count"] == 5000
    assert got[0]["within_bound"]


def test_partitioning_invariant(spark):
    rows = [(i % 13,) for i in range(1300)]
    a = cms_heavy_hitters(
        spark.createDataFrame(rows, "user_id long"), "user_id", top_n=5
    ).collect()
    b = cms_heavy_hitters(
        spark.createDataFrame(rows, "user_id long").repartition(11),
        "user_id",
        top_n=5,
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_string_key_column_rejected(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("us",), ("de",)], "country string")
    with _pytest.raises(ValueError):
        cms_heavy_hitters(df, "country")


def test_null_keys_excluded(spark):
    rows = [(1,)] * 10 + [(None,)] * 5 + [(2,)] * 3
    df = spark.createDataFrame(rows, "user_id long")
    got = cms_heavy_hitters(df, "user_id", top_n=5, eps=0.01).collect()
    assert [(r["key"], r["exact_count"]) for r in got] == [(1, 10), (2, 3)]
    assert all(r["within_bound"] for r in got)


class TestHistogramQuantileMerge:
    def _df(self, spark, vals, days=None):
        from datetime import date

        days = days or [1] * len(vals)
        rows = [(float(v), date(2024, 1, d)) for v, d in zip(vals, days)]
        return spark.createDataFrame(rows, ["value", "day"])

    def _run(self, spark, vals, days=None, **kw):
        from pyspark.sql import functions as F
        from scala_etl_test_spark.operators.sketches import histogram_quantile_merge

        df = self._df(spark, vals, days)
        return histogram_quantile_merge(df, "value", F.col("day"), **kw).orderBy("quantile").collect()

    def test_bound_holds_and_exact_rank(self, spark):
        out = self._run(spark, range(1, 101), quantiles=(0.5, 0.99), nbins=10)
        by_q = {r["quantile"]: r for r in out}
        # exact type-1 quantile of 1..100: rank ceil(0.5*100)=50 -> 50.0
        assert by_q[0.5]["exact_value"] == 50.0
        assert by_q[0.99]["exact_value"] == 99.0
        for r in out:
            assert r["within_bound"] is True
            assert abs(r["est_value"] - r["exact_value"]) <= r["bin_width"] + 1e-6

    def test_merge_is_day_partition_independent(self, spark):
        # the SAME values split across different day layouts must produce
        # identical results — the mergeability property the partials exist for
        vals = [v % 37 + 0.25 * (v % 4) for v in range(200)]
        one_day = self._run(spark, vals, days=[1] * 200)
        many_days = self._run(spark, vals, days=[(i % 28) + 1 for i in range(200)])
        assert one_day == many_days

    def test_degenerate_constant_column(self, spark):
        out = self._run(spark, [7.5] * 20, quantiles=(0.5, 0.9))
        for r in out:
            assert r["est_value"] == 7.5 and r["exact_value"] == 7.5
            assert r["bin_width"] == 0.0 and r["within_bound"] is True
