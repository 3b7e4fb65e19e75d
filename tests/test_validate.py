from __future__ import annotations

from pyspark.sql import functions as F, types as T

from scala_etl_test_spark.operators.validate import validate_data_values


def test_trim_abs_dispatch(spark):
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
            T.StructField("f", T.FloatType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("b", T.BooleanType()),
        ]
    )
    df = spark.createDataFrame([("  pad  ", -3, -4, -1.5, -2.5, True), ("x", 3, 4, 1.5, 2.5, False)], schema)
    out = validate_data_values(df).collect()
    assert out[0]["s"] == "pad"
    assert out[0]["i"] == 3 and out[0]["l"] == 4
    assert out[0]["f"] == 1.5 and out[0]["d"] == 2.5
    assert out[0]["b"] is True  # untouched non-string non-numeric
    assert out[1] == (("x", 3, 4, 1.5, 2.5, False))


def test_no_negative_hours_after_validate(spark):
    df = spark.createDataFrame([(-14,), (23,)], T.StructType([T.StructField("order_hour_of_day", T.IntegerType())]))
    out = validate_data_values(df)
    assert out.filter(F.col("order_hour_of_day") < 0).count() == 0
