"""Watermarked stream-stream join (beyond-reference).

Joining two unbounded streams requires both sides to buffer state; the
watermark + time-range condition is what makes that state finite: a click
can only match purchases from the preceding hour, so each side's buffer
holds ≤ (watermark + range) of data per key, evicted as event time advances.
Without the time bound the state grows without limit — Spark rejects such
joins in append mode for exactly this reason.

Inner-join matches emit as soon as both sides arrive (no watermark wait);
the watermark governs state eviction and late-data cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clicks_with_recent_purchase(
    clicks: DataFrame,
    purchases: DataFrame,
    window_seconds: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Pairs each click with every purchase by the same user in the
    preceding ``window_seconds``. Works identically on batch and streaming
    inputs (tests pin batch/stream parity)."""
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    return c.join(p, cond, "inner").select(
        "click_id", "user_id", "click_ts", "purchase_ts", "purchase_value"
    )


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left", broadcast: bool = True
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (bounded) dimension. No watermark and no streaming state — the static
    side is re-resolved per trigger, so a small dim broadcasts and a
    refreshed dim table is picked up on the next micro-batch without a
    restart. This is the streaming twin of the reference's broadcast
    product-details join (ApplaudoETL.scala:43-44): same plan shape, the
    fact side just happens to be unbounded.

    ``broadcast=False`` drops the hint for dimensions too large to build a
    broadcast table (the unconditional hint would override
    ``autoBroadcastJoinThreshold`` and fail the build instead of falling
    back to a shuffle join)."""
    return stream.join(F.broadcast(dim) if broadcast else dim, on=on, how=how)
