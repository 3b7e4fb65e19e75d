from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from scala_etl_test_spark.functions.cleaning import int_div
from scala_etl_test_spark.operators.category import (
    CATEGORY_MOM,
    CATEGORY_MYSTERY,
    CATEGORY_PET,
    CATEGORY_SINGLE,
    clients_category,
)
from scala_etl_test_spark.plans.pipeline import build_products
from scala_etl_test_spark.schemas import PRODUCT_DETAIL_SCHEMA, PRODUCT_SCHEMA

from tests.fixtures import orders_rows, product_details_rows


@pytest.fixture(scope="module")
def validated(spark):
    raw = spark.createDataFrame(orders_rows(), PRODUCT_SCHEMA)
    dim = spark.createDataFrame(product_details_rows(), PRODUCT_DETAIL_SCHEMA)
    return build_products([raw], dim)


def test_category_rules(validated):
    got = {r["user_id"]: r["category"] for r in clients_category(validated).collect()}
    assert got[1] == CATEGORY_MOM  # 100% mom departments
    assert got[2] == CATEGORY_SINGLE
    assert got[3] == CATEGORY_PET
    # 99%-mom user: integer division -> ratio 0 -> mystery (Trap 1)
    assert got[4] == CATEGORY_MYSTERY
    # canned goods is in both single & pet lists; priority Single > Pet
    assert got[5] == CATEGORY_SINGLE
    assert got[6] == CATEGORY_MYSTERY
    # orphan/NULL-department user: not in any list -> mystery
    assert got[7] == CATEGORY_MYSTERY


def test_int_div_semantics(spark):
    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.IntegerType())]
    )
    df = spark.createDataFrame([(3, 4), (4, 4), (0, 4), (5, 0), (-3, 2)], schema)
    out = df.select(int_div("a", "b").alias("q")).collect()
    # truncation toward zero, like Scala Int division (and SQL DIV)
    assert [r["q"] for r in out] == [0, 1, 0, None, -1]
    # total == 0 pin: NULL (no ANSI throw) -> rule branch not taken
