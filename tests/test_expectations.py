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
