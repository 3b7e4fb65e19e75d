"""Upsert operator semantics (MERGE INTO SCD-1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.merge import latest_per_key, upsert


def test_upsert_update_insert_survive(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    got = {r["k"]: (r["name"], r["v"]) for r in upsert(base, updates, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_upsert_latest_version_wins(spark):
    base = spark.createDataFrame([(1, "a", 0)], "k int, name string, ver int")
    feed = spark.createDataFrame(
        [(1, "old", 1), (1, "new", 2), (2, "x", 1)], "k int, name string, ver int"
    )
    got = {r["k"]: r["name"] for r in upsert(base, feed, ["k"], version_col="ver").collect()}
    assert got == {1: "new", 2: "x"}
    assert latest_per_key(feed, ["k"], "ver").count() == 2
