from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scala_etl_test_spark.plans.pipeline import EtlPipeline, build_products
from scala_etl_test_spark.schemas import CLIENTS_SCHEMA, PRODUCT_DETAIL_SCHEMA, PRODUCT_SCHEMA, PRODUCTS_COLUMNS

from tests.fixtures import orders_rows, product_details_rows


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(orders_rows(), PRODUCT_SCHEMA)
    dim = spark.createDataFrame(product_details_rows(), PRODUCT_DETAIL_SCHEMA)
    return raw, dim


def test_products_schema_and_cardinality(spark, frames):
    raw, dim = frames
    out = build_products([raw], dim)
    # golden 10-column header (reference README.md:60-62)
    assert out.columns == PRODUCTS_COLUMNS
    # left join preserves exploded cardinality
    exploded = raw.select(F.sum(F.size(F.split("order_detail", "~"))).alias("n")).first()["n"]
    assert out.count() == exploded
    # validation invariants: no negative numerics, hour in [0,23]
    assert out.filter(F.col("order_hour_of_day") < 0).count() == 0
    assert out.filter(F.col("order_hour_of_day") > 23).count() == 0
    # orphan product has NULL department after left join
    assert out.filter(F.col("department").isNull()).count() >= 1
    # faithful ordering: the join happens BEFORE validation trims
    # (ApplaudoETL.scala:43 then :47), so a padded product name does NOT
    # match the dimension -> NULL department, but IS trimmed in the output
    padded = out.filter(F.col("product") == "padded product")
    assert padded.count() == 1
    assert padded.first()["department"] is None


def test_end_to_end_parquet_sinks(spark, frames, tmp_path):
    raw, dim = frames
    out = EtlPipeline(spark, result_path=str(tmp_path)).run([raw], dim)
    clients = spark.read.parquet(str(tmp_path / "clients"))
    assert clients.schema == CLIENTS_SCHEMA
    n_users = raw.select("user_id").distinct().count()
    assert clients.count() == n_users
    products = spark.read.parquet(str(tmp_path / "products"))
    assert products.columns == PRODUCTS_COLUMNS
    assert out["clients"].columns == ["user_id", "category", "client_segment"]
