"""Runtime partition diagnostics: the measurement half of skew handling.

operators/skew.py supplies the remedies (salted joins, adaptive salting,
salted distinct-count); this module supplies the DIAGNOSIS — per-partition
row counts and the skew ratio — so a pipeline can alarm on imbalance
before a straggler eats the stage. Works on any DataFrame at its CURRENT
physical partitioning (call it right after the exchange under suspicion).

Implementation is ``spark_partition_id()`` + one tiny groupBy — the
aggregate's exchange carries one row per partition, so the probe costs a
single pass over the data and nothing else. The output is inherently
execution-dependent (it measures the physical layout, not the data's
logical content), so it is test-pinned rather than oracle-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, functions as F


def partition_stats(df: DataFrame) -> DataFrame:
    """Per-partition row counts: (partition_id, n_rows)."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def skew_report(df: DataFrame) -> Row:
    """One-row summary: (n_partitions, n_empty, min_rows, max_rows,
    avg_rows, skew_ratio) where skew_ratio = max/avg over NON-EMPTY
    partitions (the straggler factor: how much longer the worst task runs
    than the average). Empty partitions are reported separately — they
    dilute avg and hide skew if mixed in. Collects ONE small row."""
    stats = partition_stats(df)
    n_parts = df.rdd.getNumPartitions()
    row = stats.agg(
        F.count(F.lit(1)).alias("n_nonempty"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        F.avg("n_rows").alias("avg_rows"),
    ).collect()[0]
    n_nonempty = row["n_nonempty"] or 0
    return Row(
        n_partitions=n_parts,
        n_empty=n_parts - n_nonempty,
        min_rows=row["min_rows"] if n_nonempty else 0,
        max_rows=row["max_rows"] if n_nonempty else 0,
        avg_rows=float(row["avg_rows"]) if n_nonempty else 0.0,
        skew_ratio=(row["max_rows"] / row["avg_rows"]) if n_nonempty else 0.0,
    )
