"""As-of (time-travel) join — beyond-reference; the event/feature-alignment
primitive a training-data pipeline needs (join each observation to the most
recent state at or before its timestamp).

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The naive formulation —
range theta-join + row_number — explodes to |L|·|R| candidate pairs per key
before pruning, which is exactly what dies at 100 TB. This implementation is
the **union-window** form:

    union(tag left, tag right)
      → one window per partition key ordered by (ts, side)
      → ``last(right_value, ignoreNulls=True)`` carries the most recent
        right-side state forward onto each left row
      → filter back to left rows

Cost: ONE shuffle of |L|+|R| rows on the partition key and a sort within
partitions — the same price as a sort-merge join, with zero pair explosion.
Skewed keys are split by AQE like any other window; a tolerance bound prunes
stale matches without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    partition_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``value_cols`` of the
    most recent ``right`` row in the same partition with
    ``right_ts <= left_ts`` (NULLs when none) — DuckDB ``ASOF LEFT JOIN``
    semantics, pinned by the oracle suite.

    ``tolerance_seconds`` voids matches older than the bound (match kept
    only if ``left_ts - matched_ts <= tolerance``), like pandas
    ``merge_asof(tolerance=...)``.
    """
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    # side=0 sorts right rows before left rows at equal ts ⇒ "<=" semantics
    tagged_right = right.select(
        *[F.col(c) for c in partition_cols],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    tagged_left = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).alias(f"_v_{c}") for c in value_cols],
    )
    # positional union: align right to left's layout (left carries all its
    # own columns; right contributes NULLs for them)
    right_aligned = tagged_right.select(
        *[
            F.col(c) if c in tagged_right.columns else F.lit(None).alias(c)
            for c in [col for col in left.columns]
        ],
        "_ts",
        "_side",
        *[F.col(f"_v_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(right_aligned, allowMissingColumns=False)

    w = (
        Window.partitionBy(*partition_cols)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.last(F.when(F.col("_side") == 0, F.col("_ts")), ignorenulls=True)
        .over(w)
        .alias("_matched_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        stale = (
            F.col("_matched_ts").isNull()
            | (F.unix_micros("_ts") - F.unix_micros("_matched_ts") > tolerance_seconds * 1_000_000)
        )
        out = out.select(
            *[c for c in left.columns],
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in value_cols],
        )
    else:
        out = out.select(*[c for c in left.columns], *value_cols)
    return out
