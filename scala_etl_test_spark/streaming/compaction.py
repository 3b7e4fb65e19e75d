"""Shared exactly-once marker + compaction-watermark + staged-swap protocol.

Both incremental artifact stores — the covariance moment store
(streaming/moments.py) and the maintained IVF index (streaming/ann.py) —
converged on the same three mechanisms, previously duplicated in each file
(VERDICT r10 item 5: one home, so the next artifact and the next
crash-window bug land here once):

1. **Append markers** (``_APPENDLOG/batch_id=N`` dirs): a batch's data dirs
   are written first, the marker only after — so a replayed micro-batch
   whose marker exists is a no-op, and a crash-orphaned append (data
   without marker) is invisible to the committed-serve filter and wiped by
   the next replay or compaction.
2. **Compaction watermark** (``_COMPACTLOG/upto=N`` dirs): after committed
   per-batch state merges into one generation, the watermark subsumes the
   collapsed markers — "every batch_id ≤ N is committed" — keeping replays
   of compacted batches no-ops without per-batch tombstones (negative-id
   erasure markers are kept as tombstones by the moments store; the
   watermark never speaks for negative ids there).
3. **Staged swaps**: a merge is written to the side and swapped in with
   pure renames so no crash window loses data. Two shapes:
   whole-directory retire-then-rename (:func:`heal_interrupted_swap`, the
   moments store) and per-cell invisible ``_merged_hi_N`` staging
   (:func:`finish_cell_swap`, the IVF corpus — underscore-prefixed so
   parquet readers skip the staged generation until the rename).

The heal functions are deliberately cheap (a few ``stat``/``glob`` calls
when nothing is pending) because they run on the SERVE and APPEND paths,
not only inside compaction: ADVICE r10 found the crash windows were
recoverable only if compaction happened to run next — a restarted stream
appending first would re-create the live dir and make serving silently
drop all pre-compaction state, and the next compaction would then destroy
the retired copy. Healing before any read or append closes that window.
"""

from __future__ import annotations

import pathlib
import shutil

__all__ = [
    "marker_path",
    "marker_ids",
    "compaction_watermark",
    "write_watermark",
    "collapse_stream_markers",
    "heal_interrupted_swap",
    "finish_cell_swap",
    "finish_pending_cell_swaps",
]


# --------------------------------------------------------------------------
# append markers + compaction watermark
# --------------------------------------------------------------------------


def marker_path(base_dir: str, batch_id: int) -> pathlib.Path:
    return pathlib.Path(base_dir) / "_APPENDLOG" / f"batch_id={batch_id}"


def marker_ids(base_dir: str) -> list[int]:
    log = pathlib.Path(base_dir) / "_APPENDLOG"
    if not log.is_dir():
        return []
    return sorted(
        int(p.name.split("=", 1)[1]) for p in log.glob("batch_id=*") if p.is_dir()
    )


def compaction_watermark(base_dir: str) -> int | None:
    """Highest ``_COMPACTLOG/upto=N``: every batch_id ≤ N is committed (its
    per-batch marker may have been collapsed by compaction)."""
    log = pathlib.Path(base_dir) / "_COMPACTLOG"
    if not log.is_dir():
        return None
    ids = [int(p.name.split("=", 1)[1]) for p in log.glob("upto=*") if p.is_dir()]
    return max(ids) if ids else None


def write_watermark(base_dir: str, hi: int) -> None:
    """Record ``_COMPACTLOG/upto=hi``. Older watermarks are NOT removed
    here — collapse them via :func:`collapse_stream_markers` after the
    swap completes, so a crash between watermark and swap leaves every
    prior fact on disk."""
    (pathlib.Path(base_dir) / "_COMPACTLOG" / f"upto={hi}").mkdir(
        parents=True, exist_ok=True
    )


def collapse_stream_markers(
    base_dir: str, hi: int, keep_negative: bool = False
) -> None:
    """Delete per-batch markers the ``upto=hi`` watermark subsumes, and
    watermarks older than ``hi``. With ``keep_negative`` (the moments
    store), negative-id erasure markers survive as tombstones — their
    partials merged, but a caller retrying the same erasure_id must still
    see a no-op."""
    for b in marker_ids(base_dir):
        if b <= hi and not (keep_negative and b < 0):
            shutil.rmtree(marker_path(base_dir, b), ignore_errors=True)
    clog = pathlib.Path(base_dir) / "_COMPACTLOG"
    if clog.is_dir():
        for p in clog.glob("upto=*"):
            if int(p.name.split("=", 1)[1]) < hi:
                shutil.rmtree(p, ignore_errors=True)


# --------------------------------------------------------------------------
# whole-directory retire-then-rename swap (moments-store shape)
# --------------------------------------------------------------------------


def heal_interrupted_swap(
    live: pathlib.Path, tmp: pathlib.Path, retired: pathlib.Path
) -> None:
    """Finish a staged whole-dir swap a crash left half-done. The swap
    sequence is: write merge to ``tmp`` → record watermark → rename
    ``live`` → ``retired`` → rename ``tmp`` → ``live`` → delete
    ``retired``. Each crash window leaves a distinguishable state:

    - ``live`` missing, ``tmp`` present: crash between the two renames —
      the merge is complete (the watermark always lands before any
      rename), so finish it: ``tmp`` → ``live``, then drop ``retired``
      (its content is a superset-free re-partitioning of the merge).
    - ``live`` missing, only ``retired`` present: the merge vanished
      (manual intervention / partial cleanup) — restore the retired
      spine verbatim; nothing is lost, the next compaction re-merges.
    - ``live`` present AND ``tmp`` AND ``retired`` present: a writer
      re-created the live dir mid-swap (the ADVICE r10 data-loss
      sequence — possible only for stores written before this heal ran
      on the append path). The recreated live dir holds only
      post-crash appends; the committed pre-compaction state lives in
      ``tmp``. Merge the two: move ``tmp``'s generation dirs into
      ``live`` (collision ⇒ raise — ids at/below the watermark cannot
      be re-appended, so a collision means the store is corrupt), then
      drop ``retired``.
    - ``live`` present, only ``retired`` present: crash after the swap's
      final rename but before cleanup — drop ``retired``.
    - ``live`` present, only ``tmp`` present: the watermark/merge landed
      but the swap never started, OR the merge never committed; the live
      spine is complete either way — leave ``tmp`` for the next
      compaction run to overwrite.

    ``retired`` is only ever deleted AFTER the merged data is confirmed
    in ``live`` (the ADVICE r10 requirement).
    """
    if not live.is_dir():
        if tmp.is_dir():
            tmp.rename(live)
        elif retired.is_dir():
            retired.rename(live)
        else:
            return
        shutil.rmtree(retired, ignore_errors=True)
        return
    if tmp.is_dir() and retired.is_dir():
        for gen in sorted(tmp.iterdir()):
            if not gen.is_dir():
                continue
            target = live / gen.name
            if target.exists():
                raise RuntimeError(
                    f"interrupted-swap heal: {target} already exists — a "
                    f"generation at/below the compaction watermark was "
                    f"re-appended; refusing to guess which copy is authoritative"
                )
            gen.rename(target)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(retired, ignore_errors=True)
        return
    if retired.is_dir():
        shutil.rmtree(retired, ignore_errors=True)
    # tmp alone next to a live dir: abandoned merge, harmless — the next
    # compaction wipes and rewrites it


# --------------------------------------------------------------------------
# per-cell invisible-staging swap (IVF-corpus shape)
# --------------------------------------------------------------------------


def finish_cell_swap(cell_dir: pathlib.Path) -> None:
    """Complete a (possibly interrupted) per-cell swap: with the merged
    generation sitting INVISIBLY inside the cell as ``_merged_hi_N``
    (underscore ⇒ parquet readers skip it), delete every generation dir
    ≤ N — committed generations are all in the merge; an uncommitted
    orphan ≤ N is garbage a replay would wipe anyway — then rename the
    merge to ``batch_id=N``. Each step is idempotent, so a crash at any
    point is healed by re-running."""
    merged = next(iter(cell_dir.glob("_merged_hi_*")), None)
    if merged is None:
        return
    hi = int(merged.name.rsplit("_", 1)[1])
    for gen in cell_dir.glob("batch_id=*"):
        if int(gen.name.split("=", 1)[1]) <= hi:
            shutil.rmtree(gen, ignore_errors=True)
    merged.rename(cell_dir / f"batch_id={hi}")


def finish_pending_cell_swaps(corpus_dir: pathlib.Path) -> int:
    """Serve/append-path recovery sweep (ADVICE r10): one glob for pending
    ``_merged_hi_*`` staging dirs across all cells — a crash inside a cell
    swap otherwise leaves that cell's committed rows invisible until the
    next compaction call. Costs one directory glob when nothing is
    pending. Returns the number of cells healed."""
    healed = 0
    if not corpus_dir.is_dir():
        return healed
    for merged in corpus_dir.glob("cluster_id=*/_merged_hi_*"):
        finish_cell_swap(merged.parent)
        healed += 1
    return healed
