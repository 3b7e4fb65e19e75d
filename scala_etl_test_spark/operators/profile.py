"""Table profiling (beyond-reference data-quality utility).

One aggregation pass computes per-column null counts, exact distinct counts,
and min/max, then a ``stack`` unpivots the single result row into one row
per column — the whole profile is ONE job with ONE (partial-aggregated)
shuffle regardless of column count.

Scale notes: exact ``count_distinct`` per column is the expensive part
(one distinct-aggregate buffer per column); at petabyte scale swap in
``approx_count_distinct`` — the structure is unchanged. min/max surface as
strings so the profile schema is column-type independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column, in declared column order."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"__{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"__{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"__{c}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__{c}__nulls`, `__{c}__distinct`, `__{c}__min`, `__{c}__max`" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n_rows").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")
