from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_etl_test_spark.operators.transform import (
    merge_and_transform,
    parse_order_detail,
    positional_union,
)
from scala_etl_test_spark.schemas import PRODUCT_SCHEMA

from tests.fixtures import orders_rows


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(orders_rows(), PRODUCT_SCHEMA)


def test_explode_row_count(raw):
    # exploded rows == sum over orders of (count('~') + 1)
    expected = raw.select(
        F.sum(F.size(F.split("order_detail", "~"))).alias("n")
    ).first()["n"]
    out = parse_order_detail(raw)
    assert out.count() == expected


def test_triple_decomposition(raw):
    out = parse_order_detail(raw)
    row = out.filter((F.col("user_id") == 2) & (F.col("product") == "prod_alcohol")).first()
    assert row["aisles"].startswith("aisle_")
    assert row["number_of_products"] == 4
    assert "order_detail" not in out.columns


def test_short_triple_yields_nulls_not_a_dead_executor(spark, raw):
    """r13 edge-corpus convention pin: a detail triple with missing
    fields decomposes to NULLs (out-of-range split index ⇒ NULL) — under
    Spark 4 ANSI the old getItem path KILLED the scan on one dirty
    string, the same executor-killer class as r12's divide-by-zero."""
    base = raw.limit(1).drop("order_detail")
    dirty = base.withColumn("order_detail", F.lit("solo_product~a|b|2"))
    rows = {r["product"]: r for r in parse_order_detail(dirty).collect()}
    assert rows["solo_product"]["aisles"] is None
    assert rows["solo_product"]["number_of_products"] is None
    assert rows["a"]["aisles"] == "b" and rows["a"]["number_of_products"] == 2


def test_positional_union_keeps_duplicates(raw):
    assert positional_union(raw, raw).count() == raw.count() * 2


def test_clean_rules(raw):
    out = merge_and_transform(raw)
    # hour 24 -> 0 (user 8 first order)
    hours = {r["order_hour_of_day"] for r in out.filter(F.col("user_id") == 8).collect()}
    assert 24 not in hours and 0 in hours
    # negative hour survives until validation (abs is validate's job)
    assert -14 in hours
    # dspo truncated to int
    dspo = {r["days_since_prior_order"] for r in out.filter(F.col("user_id") == 8).collect()}
    assert dspo == {4}
    # non-ascii stripped from product names
    bad = out.filter(F.col("product").rlike(r"[^\x00-\x7F]")).count()
    assert bad == 0
    assert out.filter(F.col("product") == "prod_produce").count() >= 1
