"""Temporal regularization: turn an irregular event stream into a dense
per-key calendar grid with explicit zero/missing rows and LOCF fill.

Downstream consumers of event data (feature stores, forecasting models,
cohort dashboards) want one row per (key, period) even when nothing
happened — silent absence and observed-zero are different facts, and
gradient-based models can't learn from rows that don't exist. This module
materializes the full (key × period) grid and distinguishes the three
states: observed value, observed-nothing (count 0), and not-yet-observed
(leading NULLs before the key's first event).

Scale shape: the period axis is tiny (one row per day/hour of the observed
range — thousands, from a single min/max aggregate) and is broadcast
against the distinct-key table, so the grid build is shuffle-free beyond
the key dedup; the LOCF fill is one window per key ordered by period —
the same per-key shuffle every sequence feature reuses. Grid cardinality
is |keys| × |periods|; at 100 TB the period axis stays tiny and the grid
is simply partitioned by key like any other per-key table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def gap_fill_daily(
    df: DataFrame,
    time_col: str,
    key_col: str,
    value_col: str,
    round_digits: int = 2,
) -> DataFrame:
    """Dense per-(key, day) grid over the observed day range with
    last-observation-carried-forward fill.

    Output per row:

    - ``n_events`` — observed row count that day (0 for gap days);
    - ``day_value`` — the day's summed value, NULL on gap days (absence,
      not zero — the sum that never happened);
    - ``filled_value`` — LOCF: the most recent non-NULL ``day_value`` at
      or before this day; NULL only before the key's first observed day.

    The day range is GLOBAL (min..max over the whole input): every key
    gets the same calendar, so cross-key joins on (key, day) downstream
    are grid-aligned. Values sum in decimal and round at the boundary.
    """
    day = F.to_date(F.col(time_col))
    obs = (
        df.select(F.col(key_col).alias("key"), day.alias("day"), F.col(value_col).alias("v"))
        .groupBy("key", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("v").cast("decimal(12,2)")).alias("day_value"),
        )
    )
    bounds = df.agg(
        F.min(day).alias("_d0"), F.max(day).alias("_d1")
    )
    days = bounds.select(
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias("day")
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    grid = keys.crossJoin(F.broadcast(days))
    joined = grid.join(obs, on=["key", "day"], how="left")
    locf = Window.partitionBy("key").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return joined.select(
        F.col("key").alias(key_col),
        F.col("day").cast("string").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.round(F.col("day_value").cast("double"), round_digits).alias("day_value"),
        F.round(
            F.last("day_value", ignorenulls=True).over(locf).cast("double"),
            round_digits,
        ).alias("filled_value"),
    )
