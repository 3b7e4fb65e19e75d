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

from scala_etl_test_spark.caching import tracked_persist


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
    dilute avg and hide skew if mixed in.

    Measured with ONE ``mapPartitions`` pass over a single pinned RDD plan
    — one of the rare legitimate RDD uses: the DataFrame route would plan
    the counting job and ``getNumPartitions`` independently, and with AQE
    the two executions can disagree on the partition count (n_empty could
    even go negative). The collect ships one int per partition."""
    counts = (
        df.rdd.mapPartitions(lambda it: iter([sum(1 for _ in it)])).collect()
    )
    n_parts = len(counts)
    nonempty = [c for c in counts if c > 0]
    if not nonempty:
        return Row(
            n_partitions=n_parts, n_empty=n_parts, min_rows=0, max_rows=0,
            avg_rows=0.0, skew_ratio=0.0,
        )
    avg = sum(nonempty) / len(nonempty)
    return Row(
        n_partitions=n_parts,
        n_empty=n_parts - len(nonempty),
        min_rows=min(nonempty),
        max_rows=max(nonempty),
        avg_rows=avg,
        skew_ratio=max(nonempty) / avg,
    )


def join_cardinality_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_k: int = 10,
) -> DataFrame:
    """Exact join-output cardinality WITHOUT executing the join, plus the
    ``top_k`` keys that contribute the most output rows — the pre-flight
    check that tells you whether an equi-join is safe to run and which
    keys would dominate it. Uses the textbook identity
    ``|A ⋈ B| = Σ_k cnt_A(k) · cnt_B(k)``.

    Returns (join_key, n_left, n_right, n_pairs, total_join_rows): one row
    per top key (ordered by n_pairs desc, key asc — deterministic under
    ties), each carrying the exact total as a rider column. Keys present
    on only one side contribute nothing and are dropped by the inner join.

    Scale shape: two partial-aggregated groupBys (shuffle bytes ∝ distinct
    keys, not rows) meet in a join of count tables that are each ≤ the
    key cardinality — the profile never materializes a single joined row,
    so it is safe to run on a join whose OUTPUT would not fit anywhere.
    The top-k is a TakeOrderedAndProject and the total rides a broadcast
    1-row aggregate.
    """
    lc = left.groupBy(F.col(left_key).alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_left")
    )
    rc = right.groupBy(F.col(right_key).alias("join_key")).agg(
        F.count(F.lit(1)).alias("n_right")
    )
    # persist: BOTH consumers (total, top-k) need the key-cardinality count
    # table, and without the cache each lineage re-scans and re-aggregates
    # both full inputs — the exact cost this profiler exists to avoid
    per = (
        lc.join(rc, on="join_key")
        .withColumn("n_pairs", F.col("n_left") * F.col("n_right"))
        .transform(tracked_persist)
    )
    totals = per.agg(F.sum("n_pairs").alias("total_join_rows"))
    top = per.orderBy(F.col("n_pairs").desc(), F.col("join_key")).limit(top_k)
    return (
        top.join(F.broadcast(totals))
        .select("join_key", "n_left", "n_right", "n_pairs", "total_join_rows")
        # the broadcast join gives no ordering guarantee — re-assert the
        # documented (n_pairs desc, key) contract on the ≤ top_k rows
        .orderBy(F.col("n_pairs").desc(), F.col("join_key"))
    )
