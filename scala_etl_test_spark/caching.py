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

Callers and threading (ADVICE r5): the registry is guarded by a lock,
so concurrent operator calls cannot corrupt it — but the RELEASE
contract is still logically single-threaded: release_persisted() drops
every tracked cache session-wide, including ones backing another
thread's (or another still-unconsumed call's) lazy result, which then
silently recomputes. Release after consuming each result, from the one
thread driving the session — the pattern bench.py's per-query loop,
the corpus CLI, and the gate replica all follow.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_LOCK = threading.Lock()


@contextmanager
def tracked_scope():
    """Release on exit ONLY the intermediates persisted INSIDE the scope —
    for composite operators that consume sub-operators eagerly (the dedup
    method report counts six members one at a time) and must not touch
    caches the caller registered before the scope (the session-wide
    ``release_persisted()`` would — the r5 ADVICE hazard). Identity-based:
    frames registered before entry survive; frames appended during the
    scope are unpersisted and dropped from the registry. Nests safely."""
    with _LOCK:
        before = list(_TRACKED)
    try:
        yield
    finally:
        before_ids = {id(df) for df in before}
        with _LOCK:
            mine = [df for df in _TRACKED if id(df) not in before_ids]
            _TRACKED[:] = [df for df in _TRACKED if id(df) in before_ids]
        for df in mine:
            try:
                if df.is_cached:
                    df.unpersist()
            except Exception:
                pass


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() plus registration in the session-wide release registry."""
    df.persist()
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every operator-persisted intermediate; returns the count
    released. Idempotent; frames the caller already unpersisted are
    skipped without error."""
    released = 0
    while True:
        with _LOCK:
            if not _TRACKED:
                return released
            df = _TRACKED.pop()
        try:
            if df.is_cached:
                df.unpersist()
                released += 1
        except Exception:
            # session torn down / frame invalid: nothing left to release
            pass
