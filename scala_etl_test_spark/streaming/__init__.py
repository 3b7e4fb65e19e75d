"""Structured Streaming operators (beyond-reference; SURVEY.md §2.9).

The reference is batch-only; this package provides the streaming twins of
its incremental-ingestion and analytics capabilities:

- :mod:`sources` — checkpointed file sources (CSV orders, parquet events),
  the exactly-once upgrade of the reference's file-number watermark.
- :mod:`rollup` — watermarked tumbling-window aggregation (streaming twin of
  the batch hourly rollup).
- :mod:`sessionize` — native ``session_window`` + a custom
  ``applyInPandasWithState`` stateful operator (streaming twin of the batch
  lag/cumsum sessionization).
- :mod:`dedup` — continuous incremental LSH dedup: each micro-batch dedups
  against the persisted index and is absorbed into it; the emitted pairs
  equal one full-corpus run exactly (test-pinned).
"""

from scala_etl_test_spark.streaming.dedup import (
    compact_index,
    dedup_events_within_watermark,
    forget_from_index,
    init_index,
    stream_incremental_dedup,
)
from scala_etl_test_spark.streaming.rollup import hourly_rollup, sliding_rollup
from scala_etl_test_spark.streaming.sessionize import (
    session_windows,
    stateful_user_sessions,
)
from scala_etl_test_spark.streaming.sketches import (
    read_merged_cms,
    stream_absorb_cms,
    streaming_heavy_hitters,
)
from scala_etl_test_spark.streaming.ann import (
    append_batch_to_ivf,
    compact_ivf_cells,
    compact_ivf_index,
    forget_from_ivf_index,
    init_ivf_index,
    ivf_index_topk,
    stream_append_ivf,
)
from scala_etl_test_spark.streaming.moments import (
    append_batch_moments,
    batch_moment_partials,
    compact_moments,
    forget_from_moments,
    read_covariance,
    stream_covariance,
)
from scala_etl_test_spark.streaming.cdc import (
    merge_into_bucketed_state,
    read_state,
    read_state_bucketed,
    stream_upsert,
    stream_upsert_bucketed,
)
from scala_etl_test_spark.streaming.transitions import stateful_transitions
from scala_etl_test_spark.streaming.sources import (
    run_available_now,
    stream_documents_parquet,
    stream_events_parquet,
    stream_orders_csv,
)

__all__ = [
    "append_batch_moments",
    "batch_moment_partials",
    "compact_moments",
    "forget_from_moments",
    "read_covariance",
    "stream_covariance",
    "append_batch_to_ivf",
    "compact_index",
    "compact_ivf_cells",
    "compact_ivf_index",
    "dedup_events_within_watermark",
    "forget_from_ivf_index",
    "init_ivf_index",
    "ivf_index_topk",
    "stream_append_ivf",
    "hourly_rollup",
    "init_index",
    "read_merged_cms",
    "forget_from_index",
    "merge_into_bucketed_state",
    "read_state",
    "read_state_bucketed",
    "run_available_now",
    "stream_absorb_cms",
    "streaming_heavy_hitters",
    "sliding_rollup",
    "stream_incremental_dedup",
    "stream_upsert",
    "stream_upsert_bucketed",
    "session_windows",
    "stateful_transitions",
    "stateful_user_sessions",
    "stream_documents_parquet",
    "stream_events_parquet",
    "stream_orders_csv",
]
