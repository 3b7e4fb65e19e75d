"""Explicit StructType schemas for the engine's core relations.

The reference derives schemas from Scala case classes
(``ApplaudoETL.scala:15-18`` + ``Encoders.product[...].schema`` at ``:28``);
here they are declared StructType constants — fixed/declared, never inferred
(SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw orders fact ("Product" case class, ApplaudoETL.scala:17-18).
# order_detail carries the string-encoded nested structure
# "product|aisle|qty~product|aisle|qty~..." normalized by the transform
# operator (ApplaudoETL.scala:158-162).
PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("order_number", T.IntegerType()),
        T.StructField("order_dow", T.IntegerType()),
        T.StructField("order_hour_of_day", T.IntegerType()),
        T.StructField("days_since_prior_order", T.FloatType()),
        T.StructField("order_detail", T.StringType()),
    ]
)

# Product dimension from the REST API ("ProductDetail", ApplaudoETL.scala:15).
PRODUCT_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("product_name", T.StringType()),
        T.StructField("aisle", T.StringType()),
        T.StructField("department", T.StringType()),
    ]
)

# Derived `products` fact table — 10 columns, golden header at
# reference README.md:60-62.
PRODUCTS_COLUMNS = [
    "order_id",
    "user_id",
    "order_number",
    "order_dow",
    "order_hour_of_day",
    "days_since_prior_order",
    "product",
    "aisles",
    "number_of_products",
    "department",
]

# Derived `clients` table (reference README.md:78-81).
CLIENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("category", T.StringType()),
        T.StructField("client_segment", T.StringType()),
    ]
)


def cast_to_schema(df, schema: T.StructType):
    """Cast every column of ``df`` to the matching field type of ``schema``.

    Mirrors the JDBC schema-coercion fold (ApplaudoETL.scala:124-126) where
    the JDBC source delivers all columns as strings; expressed as a single
    select so Catalyst collapses it into one projection. Uses ``try_cast``:
    unparseable values become NULL (the reference's Spark 2.4 cast behavior)
    instead of failing the whole job under Spark 4's default ANSI mode.
    """
    from pyspark.sql import functions as F

    return df.select(
        [F.col(field.name).try_cast(field.dataType).alias(field.name) for field in schema.fields]
    )
