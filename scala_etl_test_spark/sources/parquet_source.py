"""Parquet table loader for the driver's testdata star schema."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. ``events.ts`` is TIMESTAMP(NANOS) parquet,
    which Spark only reads as long nanos (``nanosAsLong`` — set by
    ``session.build_session``); convert to a micro-precision timestamp, the
    same truncation DuckDB applies, so oracles agree."""
    from pyspark.sql import functions as F, types as T

    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in (names or TPCH_TABLES)}
