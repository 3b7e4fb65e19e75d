"""Exact proportional allocation (largest-remainder proration).

The canonical billing/revenue-recognition ETL operator: split a
group-level integer amount (cents) across the group's members
proportionally to a weight, such that the allocations are integers AND
sum EXACTLY to the group amount — no float drift, no lost cent. The
method is Hamilton's largest-remainder rule: floor every proportional
share, then hand the leftover cents (always < group size) to the members
with the largest fractional remainders, ties broken by the member's
ordinal (deterministic, engine-independent).

Everything is int64 arithmetic — products, truncating division, modulo —
so Spark and any SQL engine produce bit-identical allocations; the one
overflow hazard (amount_cents · weight_cents per member) stays below
2^53 for amounts and weights under ~10^7 cents each, the documented
domain (guard upstream if allocating larger magnitudes: split the
division or move to decimal).

Scale shape: everything is per-group windows over ONE hash exchange on
the group key (sum of weights, sum of floors, remainder rank — same
partition spec, Catalyst collapses them into one Window chain /
one shuffle). No join, no driver work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from scala_etl_test_spark.functions.cleaning import int_div


def largest_remainder_allocation(
    df: DataFrame,
    group_col: str,
    amount_cents: Column,
    weight_cents: Column,
    order_col: str,
) -> DataFrame:
    """Returns the input's (group, order) keys plus ``weight_cents``,
    ``alloc_cents`` (the exact allocation) and ``group_amount_cents``.
    Per group: Σ alloc_cents == amount_cents exactly — including
    NEGATIVE amounts (credits/refunds): shares use FLOOR division
    (``⌊num/wsum⌋`` via a positive modulus), not truncation toward
    zero, so the leftover is always in ``[0, group size)`` whatever the
    amount's sign. Weights must be ≥ 0 (they are magnitudes); a NULL
    weight is treated as 0 at intake (a NULL would otherwise poison the
    member's share while window-``sum`` skipped it, silently breaking
    the exact-sum invariant); members of a zero-total-weight group
    (degenerate, including all-NULL) allocate everything to the first
    member by ``order_col``.
    """
    w_grp = Window.partitionBy(group_col)
    base_df = df.select(
        F.col(group_col),
        F.col(order_col),
        F.coalesce(weight_cents.cast("long"), F.lit(0)).alias("weight_cents"),
        amount_cents.cast("long").alias("_amount"),
    )
    with_sums = base_df.withColumn("_wsum", F.sum("weight_cents").over(w_grp))
    num = F.col("_amount") * F.col("weight_cents")
    # floor division via positive modulus: wsum > 0 here, so
    # pm ∈ [0, wsum) and (num - pm)/wsum == ⌊num/wsum⌋ exactly in int64 —
    # int_div/'DIV' truncate toward zero and would LOSE a cent per
    # negative group (leftover would go negative, distributing nothing)
    pm = F.when(
        F.col("_wsum") != 0,
        ((num % F.col("_wsum")) + F.col("_wsum")) % F.col("_wsum"),
    ).otherwise(F.lit(0))
    base = F.coalesce(int_div(num - pm, F.col("_wsum")), F.lit(0))
    rem = pm
    stepped = with_sums.withColumn("_base", base).withColumn("_rem", rem)
    w_rank = Window.partitionBy(group_col).orderBy(
        F.col("_rem").desc(), F.col(order_col)
    )
    ranked = (
        stepped.withColumn("_floor_sum", F.sum("_base").over(w_grp))
        .withColumn("_rank", F.row_number().over(w_rank))
    )
    leftover = F.col("_amount") - F.col("_floor_sum")
    alloc = F.when(
        F.col("_wsum") == 0,
        F.when(F.col("_rank") == 1, F.col("_amount")).otherwise(F.lit(0)),
    ).otherwise(
        F.col("_base") + F.when(F.col("_rank") <= leftover, 1).otherwise(0)
    )
    return ranked.select(
        group_col,
        order_col,
        "weight_cents",
        alloc.cast("long").alias("alloc_cents"),
        F.col("_amount").alias("group_amount_cents"),
    )
