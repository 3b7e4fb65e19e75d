"""Watermarked event-time windowed aggregation (beyond-reference).

Streaming form of ``plans.queries.q_events_hourly_rollup`` — the batch
``date_trunc('hour')`` groupBy becomes a tumbling event-time window with a
watermark bounding state for late data.

Scale notes:
- State size = open windows × distinct event_type — bounded by the watermark
  horizon, not the stream length; this is what makes the operator safe on an
  unbounded 100 TB/day feed.
- The output projection matches the batch query column-for-column, so
  batch/stream parity is a direct DataFrame comparison (tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hourly_rollup(
    events: DataFrame, watermark: str = "2 hours", window_size: str = "1 hour"
) -> DataFrame:
    """Tumbling-window count + value-sum per (hour bucket, event_type).

    ``withWatermark`` declares how late events may arrive; windows older than
    (max event time − watermark) finalize and their state is evicted. In
    append mode only finalized windows emit (exactly-once, late-data-safe);
    complete/update modes emit earlier at the cost of retraction semantics.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    watermark: str = "2 hours",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Overlapping-window count + value-sum per (window start, event_type) —
    the streaming twin of the batch ``events_sliding_window`` query (each
    event lands in window_size/slide windows; Spark replicates it into its
    covering windows JVM-side). State ∝ open windows × groups: with a
    2-hour watermark and 15-minute slide at most ~12 windows per group are
    live, independent of stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
