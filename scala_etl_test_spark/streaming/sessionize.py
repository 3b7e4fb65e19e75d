"""Sessionization: native ``session_window`` + a custom stateful operator
(beyond-reference; the batch twin is ``plans.queries.q_events_sessionize``).

Two implementations, deliberately:

1. :func:`session_windows` — Spark's built-in gap-based ``session_window``
   aggregation. The declarative form: works identically in batch and
   streaming, state is watermark-bounded, merging of overlapping windows is
   handled by the engine. This is the production path.
2. :func:`stateful_user_sessions` — the same semantics hand-built on
   ``applyInPandasWithState``, demonstrating the engine's custom-stateful-
   operator extension point (arbitrary per-key state, Arrow-batched). Use
   this shape for logic ``session_window`` can't express (e.g. dynamic
   per-user gaps, cross-field session rules, decaying counters).

Scale notes:
- Both shuffle once on ``user_id``; state per live key only.
- The Pandas-state path keeps per-key state tiny (3 numbers) — the state
  store, not the executor heap, owns it; RocksDB state store recommended at
  production scale.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str | None = None) -> DataFrame:
    """Per (user, session) stats via the native gap-based session window.

    Batch: exact twin of the lag/cumsum formulation in
    ``q_events_sessionize`` (pinned by tests). Streaming: pass ``watermark``
    and run in append mode — sessions emit when the watermark passes their
    close."""
    if watermark is not None:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _update_user_sessions(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session counter: state = (last event time, sessions, events).
    Events are processed in event-time order within the batch; a gap larger
    than SESSION_GAP_SECONDS opens a new session. Emits the running totals
    after each batch (update semantics — latest row per user wins)."""
    if state.exists:
        last_ts_us, n_sessions, n_events = state.get
    else:
        last_ts_us, n_sessions, n_events = None, 0, 0
    # collect ALL Arrow chunks before sorting: a group larger than
    # arrow.maxRecordsPerBatch arrives as several pandas frames in
    # arbitrary post-shuffle order — sorting each chunk independently
    # would interleave event time across chunks and miscount gaps
    chunks = [pdf for pdf in batches if not pdf.empty]
    if chunks:
        whole = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        ts_us = (whole["ts"].astype("int64") // 1000).sort_values()
        for t in ts_us:
            if last_ts_us is None or (t - last_ts_us) > SESSION_GAP_SECONDS * 1_000_000:
                n_sessions += 1
            last_ts_us = int(t)
            n_events += 1
    state.update((last_ts_us, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def stateful_user_sessions(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user session/event running totals via
    ``applyInPandasWithState`` (Arrow-batched arbitrary state).

    Output mode "update": one row per user per micro-batch with the running
    totals; on a bounded stream the last row per user equals the batch
    ``q_events_sessionize`` answer (pinned by tests)."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_sessions,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
