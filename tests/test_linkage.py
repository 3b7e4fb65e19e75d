"""Fellegi–Sunter record linkage (operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.linkage import blocked_pairs, fellegi_sunter_score


def _tables(spark):
    left = spark.createDataFrame(
        [(1, "ann", "NY", 100.0), (2, "bob", "NY", 50.0), (3, "cal", "CA", 75.0)],
        "id long, name string, state string, bal double",
    )
    right = spark.createDataFrame(
        [(11, "ann", "NY", 100.0), (12, "rob", "NY", 50.0), (13, "cal", "TX", 75.0)],
        "rid long, name string, state string, bal double",
    )
    return left, right


def test_blocking_restricts_to_key(spark):
    left, right = _tables(spark)
    pairs = blocked_pairs(left, right, ["state"])
    got = {(r["l_id"], r["r_rid"]) for r in pairs.collect()}
    # CA x TX never meet; NY block is 2x2
    assert got == {(1, 11), (1, 12), (2, 11), (2, 12)}


def test_score_and_three_way_decision(spark):
    left, right = _tables(spark)
    pairs = blocked_pairs(left, right, ["state"])
    scored = fellegi_sunter_score(
        pairs,
        [
            ("name", F.col("l_name") == F.col("r_name"), 10.0, -1.0),
            ("bal", F.abs(F.col("l_bal") - F.col("r_bal")) < 1.0, 3.0, -3.0),
        ],
        upper=8.0,
        lower=2.0,
    )
    rows = {(r["l_id"], r["r_rid"]): (r["score"], r["decision"]) for r in scored.collect()}
    assert rows[(1, 11)] == (13.0, "match")        # both agree
    assert rows[(2, 12)] == (2.0, "possible")      # bal only: -1 + 3
    assert rows[(1, 12)] == (-4.0, "non_match")    # neither
    assert rows[(2, 11)] == (-4.0, "non_match")


def test_null_comparator_counts_as_disagreement(spark):
    left = spark.createDataFrame([(1, None, "NY")], "id long, name string, state string")
    right = spark.createDataFrame([(9, "ann", "NY")], "rid long, name string, state string")
    scored = fellegi_sunter_score(
        blocked_pairs(left, right, ["state"]),
        [("name", F.col("l_name") == F.col("r_name"), 5.0, -5.0)],
        upper=1.0,
        lower=0.0,
    )
    r = scored.collect()[0]
    assert r["agree_name"] is False and r["score"] == -5.0 and r["decision"] == "non_match"
