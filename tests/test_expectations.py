"""Data-quality expectations: one-pass rule evaluation, NULL counts as a
violation, uniqueness counts rows beyond the first per key."""

from __future__ import annotations

from scala_etl_test_spark.operators.expectations import (
    check_rules,
    in_range,
    matches,
    non_negative,
    not_null,
)


def _report(df):
    return {r["rule"]: (r["n_rows"], r["n_violations"], r["pass"]) for r in df.collect()}


def test_rules_count_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),  # negative
            (3, None, "bad!"),  # NULL amount (unknown ≠ pass), bad code
            (None, 1.0, "ok"),  # NULL id
        ],
        "id long, amount double, code string",
    )
    got = _report(
        check_rules(df, [not_null("id"), non_negative("amount"), matches("code", "^[a-z]+$")])
    )
    assert got["id_not_null"] == (4, 1, False)
    assert got["amount_non_negative"] == (4, 2, False)  # -5 and NULL
    assert got["code_matches"] == (4, 1, False)


def test_unique_key_and_all_pass(spark):
    df = spark.createDataFrame(
        [(1, 5), (1, 6), (2, 7), (3, 8)], "k long, v long"
    )
    got = _report(check_rules(df, [in_range("v", 0, 100)], unique_keys=["k"]))
    assert got["v_in_range"] == (4, 0, True)
    assert got["k_unique"] == (4, 1, False)  # one row beyond the first for k=1


def test_single_pass_plan(spark):
    """All row-local rules must evaluate in ONE aggregate over ONE scan —
    the report over N rules cannot cost N scans (stack-melt of the wide
    row, not a per-rule union that re-executes the aggregate)."""
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    report = check_rules(df, [not_null("id"), non_negative("v"), in_range("v", 0, 1000)])
    p = report._jdf.queryExecution().executedPlan().toString()
    assert p.count("Range (0, 100") == 1, p  # the source appears exactly once
    assert p.count("Exchange hashpartitioning") == 0, p


def test_empty_table_passes_vacuously(spark):
    """An empty partition-day table must report 0 violations and pass=True
    — a NULL pass would spuriously fail a gate and vanish from a
    `pass = false` alert filter."""
    df = spark.createDataFrame([], "id long, v long")
    got = _report(check_rules(df, [not_null("id")], unique_keys=["id"]))
    assert got["id_not_null"] == (0, 0, True)
    assert got["id_unique"] == (0, 0, True)


def test_odd_column_names_and_duplicate_rules(spark):
    import pytest as _pytest

    from scala_etl_test_spark.operators.expectations import Rule
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,)], ["order date"])
    got = _report(check_rules(df, [not_null("order date")]))
    assert got["order date_not_null"] == (1, 0, True)
    # quote in a rule name must not inject into the stack expression
    got2 = _report(check_rules(df, [Rule("it's fine", F.col("order date") > 0)]))
    assert got2["it's fine"] == (1, 0, True)
    with _pytest.raises(ValueError, match="duplicate rule names"):
        check_rules(df, [in_range("order date", 0, 1), in_range("order date", 5, 9)])


def test_no_rules_no_keys_empty_report(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    report = check_rules(df, [])
    assert report.columns == ["rule", "n_rows", "n_violations", "pass"]
    assert report.count() == 0
