"""Session-wide registry of operator-persisted intermediates.

Several operators persist() an intermediate that the RETURNED (lazy)
plan consumes — the shared shingle table under MinHash, the oriented
edge list under triangle counting, the tokenized corpus under drift
stats. The operator cannot unpersist before returning (the caller's
action hasn't run yet), so a long-lived session accumulated caches
across calls (ADVICE r4, operators/recsys.py:52): MEMORY_AND_DISK
blocks evict under pressure, but executor memory they occupy is not
free.

Contract: every operator-internal persist goes through
``tracked_persist``; callers that run many operators in one session
(the corpus CLI, notebook loops, the driver gate) call
``release_persisted()`` after consuming each result — it unpersists
everything the registry holds and empties it. ``spark.catalog.
clearCache()`` remains the big hammer (it also drops caches the CALLER
created); the registry releases only operator-internal ones.

The registry holds strong references on purpose: a weakly-held frame
whose Python handle died would leave its JVM cache unreachable until
GC — exactly the leak this module exists to close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() plus registration in the session-wide release registry."""
    df.persist()
    _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every operator-persisted intermediate; returns the count
    released. Idempotent; frames the caller already unpersisted are
    skipped without error."""
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            if df.is_cached:
                df.unpersist()
                released += 1
        except Exception:
            # session torn down / frame invalid: nothing left to release
            pass
    return released
