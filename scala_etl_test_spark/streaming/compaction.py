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

4. **Per-store swap lock** (:func:`swap_lock`, ADVICE r11): because heal
   now runs on the serve/append paths, a healer can RACE a live
   compactor mid-swap — the r11 TOCTOU: the healer globs
   ``_merged_hi_N``, the compactor renames it to ``batch_id=N``, then
   the healer's delete loop (gens ≤ N) rmtree's that freshly-renamed
   merged generation — the only committed copy — and its own rename
   raises ``FileNotFoundError``. All swap-mutating sections (compaction
   AND heal) therefore serialize on a per-store lock: an in-process
   ``threading.Lock`` keyed on the store path plus a same-host
   cross-process ``_SWAPLOCK`` dir (atomic ``mkdir``) holding the owner
   pid, stolen via atomic *rename* when the owner is dead so two
   stealers cannot both win. Serve/append healers acquire with
   ``wait=False`` and simply SKIP healing when a live owner holds the
   lock — that owner is mid-swap and will finish it; compactors acquire
   with ``wait=True``. Pid-liveness stealing assumes the stores' staging
   filesystem is same-host (true for the local-fs delta spines these
   stores use); on a shared filesystem run a single maintenance process
   per store — the lock then degrades to the documented single-process
   model rather than silently corrupting.
"""

from __future__ import annotations

import contextlib
import os
import pathlib
import shutil
import threading
import time

__all__ = [
    "marker_path",
    "marker_ids",
    "compaction_watermark",
    "write_watermark",
    "collapse_stream_markers",
    "heal_interrupted_swap",
    "finish_cell_swap",
    "finish_pending_cell_swaps",
    "swap_lock",
]


# --------------------------------------------------------------------------
# per-store swap lock (serializes heal vs compaction — ADVICE r11)
# --------------------------------------------------------------------------

_INPROC_LOCKS: dict[str, threading.Lock] = {}
_INPROC_LOCKS_GUARD = threading.Lock()


def _inproc_lock(key: str) -> threading.Lock:
    with _INPROC_LOCKS_GUARD:
        return _INPROC_LOCKS.setdefault(key, threading.Lock())


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _try_fs_lock(lockdir: pathlib.Path) -> bool:
    """One non-blocking attempt at the cross-process lockdir. Steal a dead
    owner's lock via atomic rename (only one stealer's rename succeeds),
    never rmtree-in-place (two stealers could otherwise both 'win' and one
    would delete the other's fresh lock)."""
    try:
        lockdir.mkdir(parents=True, exist_ok=False)
    except FileExistsError:
        pid_file = lockdir / "pid"
        try:
            owner = int(pid_file.read_text())
        except (FileNotFoundError, ValueError, OSError):
            # owner is mid-write (or the dir is vanishing) — treat as held;
            # the caller retries or skips
            return False
        if owner == os.getpid() or _pid_alive(owner):
            return False
        stale = lockdir.with_name(f"{lockdir.name}.stale.{os.getpid()}")
        try:
            lockdir.rename(stale)
        except OSError:
            return False  # lost the steal race — someone else renamed first
        shutil.rmtree(stale, ignore_errors=True)
        try:
            lockdir.mkdir(parents=True, exist_ok=False)
        except FileExistsError:
            return False
    try:
        (lockdir / "pid").write_text(str(os.getpid()))
    except OSError:
        shutil.rmtree(lockdir, ignore_errors=True)
        return False
    return True


@contextlib.contextmanager
def swap_lock(
    base_dir: str | pathlib.Path,
    *,
    wait: bool = True,
    timeout: float = 120.0,
    poll: float = 0.05,
):
    """Per-store mutual exclusion for every swap-mutating section.

    Yields ``True`` when acquired. With ``wait=False`` (the serve/append
    healers) yields ``False`` immediately when another live owner holds
    the store — the correct reaction there is to SKIP healing, because a
    live owner is mid-swap and finishes it itself. With ``wait=True``
    (compactors) blocks up to ``timeout`` seconds then raises
    ``TimeoutError`` — a held lock that long means a second maintenance
    process is running against the same store, which the protocol forbids.

    The lockdir lives INSIDE the store (``_SWAPLOCK``, underscore ⇒
    parquet readers skip it), so locking never touches paths outside the
    store and vanishes with it.
    """
    key = os.path.realpath(str(base_dir))
    tl = _inproc_lock(key)
    if wait:
        got_inproc = tl.acquire(timeout=timeout)
    else:
        got_inproc = tl.acquire(blocking=False)
    if not got_inproc:
        if wait:
            raise TimeoutError(f"swap_lock: in-process lock busy for {key}")
        yield False
        return
    lockdir = pathlib.Path(base_dir) / "_SWAPLOCK"
    fs_acquired = False
    try:
        deadline = time.monotonic() + timeout
        while True:
            if _try_fs_lock(lockdir):
                fs_acquired = True
                break
            if not wait:
                break
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"swap_lock: {lockdir} held by a live process for >"
                    f"{timeout}s — two maintenance processes on one store?"
                )
            time.sleep(poll)
        yield fs_acquired
    finally:
        if fs_acquired:
            shutil.rmtree(lockdir, ignore_errors=True)
        tl.release()


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

    CALLER MUST HOLD :func:`swap_lock` on the store dir (ADVICE r11):
    unserialized, this heal's renames race a live ``compact_moments``
    mid-swap (e.g. restoring ``retired`` → ``live`` just as the compactor
    renames ``tmp`` → ``live``). The moments store's serve/append paths
    acquire with ``wait=False`` and skip when a live compactor owns it.
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
    point is healed by re-running.

    CALLER MUST HOLD :func:`swap_lock` on the corpus dir (ADVICE r11):
    unserialized, a second healer's delete loop can rmtree the merged
    generation the first healer just renamed to ``batch_id=N`` — the only
    committed copy. :func:`finish_pending_cell_swaps` acquires the lock;
    compactors hold it across plan+stage+swap."""
    merged = next(iter(cell_dir.glob("_merged_hi_*")), None)
    if merged is None:
        return
    hi = int(merged.name.rsplit("_", 1)[1])
    for gen in cell_dir.glob("batch_id=*"):
        if int(gen.name.split("=", 1)[1]) <= hi:
            shutil.rmtree(gen, ignore_errors=True)
    merged.rename(cell_dir / f"batch_id={hi}")


def _finish_pending_cell_swaps_unlocked(corpus_dir: pathlib.Path) -> int:
    """The sweep body — caller must hold :func:`swap_lock` on the corpus."""
    healed = 0
    for merged in corpus_dir.glob("cluster_id=*/_merged_hi_*"):
        finish_cell_swap(merged.parent)
        healed += 1
    return healed


def finish_pending_cell_swaps(corpus_dir: pathlib.Path) -> int:
    """Serve/append-path recovery sweep (ADVICE r10): one glob for pending
    ``_merged_hi_*`` staging dirs across all cells — a crash inside a cell
    swap otherwise leaves that cell's committed rows invisible until the
    next compaction call. Costs one directory glob when nothing is
    pending. Returns the number of cells healed.

    Lock-aware (ADVICE r11): if a LIVE owner holds the store's
    :func:`swap_lock` — a compactor mid-swap — healing is SKIPPED (returns
    0); that owner finishes its own swap, and racing it here is exactly
    the r11 TOCTOU. A DEAD owner's lock is stolen, so a crash mid-swap
    still heals on the very next serve/append, same as before."""
    if not corpus_dir.is_dir():
        return 0
    with swap_lock(corpus_dir, wait=False) as acquired:
        if not acquired:
            return 0
        return _finish_pending_cell_swaps_unlocked(corpus_dir)
