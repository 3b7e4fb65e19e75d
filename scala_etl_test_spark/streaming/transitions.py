"""Streaming twin of the batch Markov transition matrix
(plans/queries.py:q_event_transitions): per-user (event_type → next
event_type) step counts maintained ACROSS micro-batches with
``applyInPandasWithState``.

The cross-batch boundary is the whole point: the last event of a user in
batch N and their first event in batch N+1 form a step that no per-batch
(stateless) window can see — state carries exactly that one row
(last ts, id, type) per user, the minimum sufficient statistic for
first-order transitions.

Emission semantics: APPEND-mode per-batch DELTAS — each output row is the
number of (from, to) steps this user contributed in this micro-batch
(including the boundary step). Totals are an associative downstream sum,
so the result is partition-order-independent; on an at-least-once replay
a production consumer dedupes on (user, batch_id) before summing, the
same contract as the per-batch CMS grids in streaming/sketches.py.

Ordering contract (same as the stateful sessionizer): event-time order
WITHIN a batch is restored by an explicit sort; batches themselves must
arrive time-ordered per user (true for file/kafka sources partitioned by
time). Out-of-order ARRIVAL across batches is precisely what
events_lateness_audit measures — feed its p95 into a watermark + delay
stage upstream of this operator when the source reorders.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("n_steps", T.LongType()),
    ]
)


def _update_transitions(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts_us, last_event_id, last_type = state.get
    else:
        last_ts_us, last_event_id, last_type = None, None, None
    counts: dict[tuple[str, str], int] = {}
    # collect ALL Arrow chunks before the single sort: a group larger than
    # arrow.maxRecordsPerBatch arrives as several pandas frames in
    # arbitrary post-shuffle order — sorting per chunk would leave
    # inter-chunk event-time order broken and miscount steps
    chunks = [pdf for pdf in batches if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        types = pdf["event_type"].tolist()
        prev = last_type
        for t in types:
            if prev is not None:
                pair = (prev, t)
                counts[pair] = counts.get(pair, 0) + 1
            prev = t
        last_type = types[-1]
        last_ts_us = int(pdf["ts"].astype("int64").iloc[-1] // 1000)
        last_event_id = int(pdf["event_id"].iloc[-1])
    state.update((last_ts_us, last_event_id, last_type))
    if counts:
        rows = [
            {"user_id": key[0], "from_type": a, "to_type": b, "n_steps": n}
            for (a, b), n in sorted(counts.items())
        ]
        yield pd.DataFrame(rows)


def stateful_transitions(events: DataFrame) -> DataFrame:
    """Per-user transition-step deltas per micro-batch (append mode).

    Summing ``n_steps`` over the drained output per (from_type, to_type)
    equals the batch ``q_event_transitions`` counts on the same data —
    pinned by tests/test_streaming.py with multi-batch ingestion so the
    cross-batch boundary step is actually exercised."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
