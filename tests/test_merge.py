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


def test_scd2_history_versions_and_collapse(spark):
    """Change log → versioned intervals: consecutive identical states
    collapse (redeliveries produce no version), valid_to chains to the next
    version's valid_from, and only the last version per key is current."""
    from scala_etl_test_spark.operators.merge import scd2_history

    chg = spark.createDataFrame(
        [
            (1, "bronze", 1),
            (1, "bronze", 2),  # no-op redelivery — must not open a version
            (1, "silver", 3),
            (1, "gold", 5),
            (2, "gold", 4),
        ],
        "k int, tier string, ts int",
    )
    rows = sorted(
        (tuple(r) for r in scd2_history(chg, ["k"], ["tier"], "ts").collect())
    )
    assert rows == [
        (1, "bronze", 1, 3, False),
        (1, "gold", 5, None, True),
        (1, "silver", 3, 5, False),
        (2, "gold", 4, None, True),
    ]


def test_scd2_reopened_state_is_a_new_version(spark):
    """A state that returns after an intermediate change opens a NEW
    version (A→B→A is three intervals, not a merged one)."""
    from scala_etl_test_spark.operators.merge import scd2_history

    chg = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "a", 3)], "k int, s string, ts int"
    )
    got = sorted(tuple(r) for r in scd2_history(chg, ["k"], ["s"], "ts").collect())
    assert got == [(1, "a", 1, 2, False), (1, "a", 3, None, True), (1, "b", 2, 3, False)]
