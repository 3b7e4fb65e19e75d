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
