"""CDC-style table maintenance: SCD-1 upsert (MERGE INTO semantics) as a
batch DataFrame operator (beyond-reference; the maintenance primitive for
refreshing a 100 TB corpus/dimension table from a change feed).

Semantics match ``MERGE INTO base USING updates ON key WHEN MATCHED THEN
UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` — updates win on key collision,
unmatched update rows insert, untouched base rows survive.

Scale notes:
- Implemented as **left-anti join + unionByName**, not a full-outer join: the
  outer-join form widens to both schemas and coalesces every column (2×
  column traffic, a projection per column), while anti+union moves each row
  once and keeps the union narrow. Both shuffle on the key; with a bucketed
  base table the anti join is exchange-free on the base side.
- The change feed is deduplicated to latest-per-key *first* (window top-1 by
  the version column), so a hot key in the feed cannot fan out.
- No driver-side state; safe at any feed size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    updates: DataFrame, key_cols: Sequence[str], version_col: str | None
) -> DataFrame:
    """Collapse a change feed to exactly one row per key: newest version
    first (when ``version_col`` is given), ties — and the no-version case —
    broken by a deterministic total order (``xxhash64`` over every column),
    so the same feed collapses identically regardless of partitioning or
    run. A strictly monotone version column remains the caller's tool for
    *meaningful* (not merely stable) winner selection."""
    order = [F.xxhash64(*updates.columns).asc()]
    if version_col is not None:
        order.insert(0, F.col(version_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    version_col: str | None = None,
) -> DataFrame:
    """SCD-1 merge: rows from ``updates`` replace base rows with the same
    key and insert otherwise. Schemas must match by name.

    The feed is ALWAYS collapsed to one row per key first (newest
    ``version_col`` wins; deterministic hash tie-break) — the merged table
    is key-unique by construction. Documented divergence from SQL MERGE
    INTO, which *errors* on multiple source matches: erroring from a lazy
    distributed plan would cost an extra action, so this operator resolves
    deterministically instead; pass a real version column when the feed can
    carry multiple updates per key."""
    keys = list(key_cols)
    updates = latest_per_key(updates, keys, version_col)
    survivors = base.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    return survivors.unionByName(updates)


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension type 2: turn a change log into versioned
    dimension history — one row per (key, attribute state) interval with
    ``valid_from`` / ``valid_to`` / ``is_current``.

    Two window passes over one shuffle (both windows share the
    partitionBy-key ordering):

    1. change detection — a log row opens a new version iff any tracked
       attribute differs from the key's previous log row (struct
       inequality; the first row always opens). Consecutive identical
       states collapse, so redelivered/no-op change events produce no
       spurious versions.
    2. interval assembly — ``valid_to`` = the next version's
       ``valid_from`` (NULL on the open row ⇒ ``is_current``).

    Determinism: ties on (key, ts) are broken by the tracked-state hash, so
    the same log yields the same history under any partitioning. At scale
    this is one shuffle on the dimension key — change logs are orders of
    magnitude smaller than fact tables, and the per-key window state is one
    struct.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    state = F.struct(*[F.col(c) for c in tracked])
    order = [F.col(ts_col).asc(), F.xxhash64(*tracked).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    opened = (
        changes.select(*keys, *tracked, F.col(ts_col))
        .withColumn("_prev", F.lag(state).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != state))
        .drop("_prev")
    )
    # same tie-break as the change-detection window: without it, two
    # versions opened at the same ts would chain valid_from/valid_to
    # nondeterministically across runs/partitionings
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        opened.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop(ts_col)
    )
