"""Leakage-guard semantics of the PIT training-set assembly
(plans/queries.py:q_training_set_pit): the feature frame is (-7d, -1µs]
— never the label row, never same-microsecond peers, never the future."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from scala_etl_test_spark.plans.queries import _PIT_WINDOW_US


def _frame_counts(spark, rows):
    """Re-create the exact feature window on a toy frame."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string, value double")
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us).rangeBetween(-_PIT_WINDOW_US, -1)
    out = df.select(
        "event_id", F.count(F.lit(1)).over(w).alias("n_before")
    )
    return {r["event_id"]: r["n_before"] for r in out.collect()}


def test_frame_excludes_self_peers_and_future(spark):
    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, 1, t0 - dt.timedelta(days=8), "click", 1.0),   # outside 7d window
        (1, 2, t0 - dt.timedelta(days=3), "click", 1.0),   # inside
        (1, 3, t0, "purchase", 5.0),                        # the label
        (1, 4, t0, "click", 1.0),                           # same-microsecond peer
        (1, 5, t0 + dt.timedelta(hours=1), "click", 1.0),   # future
    ]
    n = _frame_counts(spark, rows)
    # label sees ONLY event 2: not itself, not its same-us peer, not the
    # future, not the stale 8-day-old click
    assert n[3] == 1
    # the boundary: an event exactly 7d before IS included (frame closed at -7d)
    rows2 = rows + [(1, 6, t0 - dt.timedelta(days=7), "click", 1.0)]
    n2 = _frame_counts(spark, rows2)
    assert n2[3] == 2
