"""Sinks (SURVEY §2.1 S7/S8).

Reference: ``storeData`` (ApplaudoETL.scala:283-285) writes
``overwrite``-mode parquet, one directory per logical table; console fallback
is ``show(10, truncate=false)`` (``:53``, ``:65``).

Scale notes: partition-by and bucketing knobs exposed so the same sink writes
a 100 TB table as a partitioned layout readers can prune
(``partitionBy=["order_dow"]`` etc.); the reference's flat layout remains the
default for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def store_parquet(
    df: DataFrame,
    base_path: str,
    table_name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{base_path}/{table_name}")


def show_console(df: DataFrame, n: int = 10) -> None:
    df.show(n, truncate=False)
