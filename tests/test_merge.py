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


def test_upsert_duplicate_key_feed_stays_key_unique(spark):
    """A feed with repeated keys and no version column must still merge to
    ONE row per key, chosen deterministically (hash tie-break) — never a
    duplicated dimension row."""
    base = spark.createDataFrame([(1, "a", 10.0)], "k int, name string, v double")
    feed = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0), (1, "x", 1.0)], "k int, name string, v double"
    )
    merged = upsert(base, feed, ["k"])
    rows = merged.collect()
    assert len(rows) == 1 and rows[0]["k"] == 1 and rows[0]["name"] in {"x", "y"}
    # deterministic across repartitionings of the same feed
    again = upsert(base, feed.repartition(7), ["k"]).collect()
    assert rows == again
