"""Schema-driven data validation.

Reference: ``validateDataValues`` (ApplaudoETL.scala:176-189) dispatches on
each field's runtime DataType — ``trim`` for strings, ``abs`` for numerics
(fixes the negative hours that arrive from the MSSQL side, doc at
``:170-175``). Rebuilt as a single ``select`` built from ``df.schema.fields``
so Catalyst sees one projection (vs the reference's chained withColumn fold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

_NUMERIC_TYPES = (
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)


def validate_data_values(df: DataFrame) -> DataFrame:
    """Trim every string column, abs() every numeric column, pass everything
    else through untouched — schema introspection over
    {String, Int, Long, Float, Double, other} exactly as the reference's
    runtime-DataType dispatch (ApplaudoETL.scala:179-186)."""
    cols = []
    for field in df.schema.fields:
        col = F.col(field.name)
        if isinstance(field.dataType, T.StringType):
            cols.append(F.trim(col).alias(field.name))
        elif isinstance(field.dataType, _NUMERIC_TYPES):
            cols.append(F.abs(col).alias(field.name))
        else:
            cols.append(col)
    return df.select(cols)
