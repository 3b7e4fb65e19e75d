"""Unit tests for the shared compaction protocol (streaming/compaction.py)
— pure-pathlib state-machine coverage, no Spark session needed.

heal_interrupted_swap is exercised over EVERY presence combination of
(live, tmp, retired): the swap sequence `write tmp → watermark → live→
retired → tmp→live → rm retired` can crash in any window, and the one
invariant that must hold in all of them is "no committed generation is
lost, and retired is never deleted before its content is confirmed live"
(the ADVICE r10 data-loss sequence was exactly a violation of this,
reachable through an append that re-created the live dir mid-swap).
"""

from __future__ import annotations

import pathlib

import pytest

from scala_etl_test_spark.streaming.compaction import (
    collapse_stream_markers,
    compaction_watermark,
    heal_interrupted_swap,
    finish_cell_swap,
    finish_pending_cell_swaps,
    marker_ids,
    marker_path,
    write_watermark,
)


def _mk(base: pathlib.Path, name: str, gens: dict[str, str]) -> pathlib.Path:
    d = base / name
    for gen, content in gens.items():
        (d / gen).mkdir(parents=True)
        (d / gen / "part-0.parquet").write_text(content)
    if not gens:
        d.mkdir(parents=True)
    return d


def _gens(d: pathlib.Path) -> dict[str, str]:
    if not d.is_dir():
        return {}
    return {
        p.name: (p / "part-0.parquet").read_text()
        for p in sorted(d.iterdir())
        if p.is_dir()
    }


class TestHealInterruptedSwap:
    """All eight presence combinations; content equality proves which
    copy survived."""

    def _paths(self, tmp_path):
        return (
            tmp_path / "partials",
            tmp_path / "partials_compacting",
            tmp_path / "partials_retired",
        )

    def test_nothing_present_is_noop(self, tmp_path):
        live, tmp, retired = self._paths(tmp_path)
        heal_interrupted_swap(live, tmp, retired)
        assert not live.exists() and not tmp.exists() and not retired.exists()

    def test_live_only_is_noop(self, tmp_path):
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials", {"batch_id=0": "a", "batch_id=1": "b"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=0": "a", "batch_id=1": "b"}

    def test_tmp_only_finishes_swap(self, tmp_path):
        """Crash between the two renames, retired already cleaned (cannot
        happen in the real sequence, but heal must still converge)."""
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials_compacting", {"batch_id=1": "merged"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=1": "merged"}
        assert not tmp.exists() and not retired.exists()

    def test_retired_only_restores_spine(self, tmp_path):
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials_retired", {"batch_id=0": "a", "batch_id=1": "b"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=0": "a", "batch_id=1": "b"}
        assert not retired.exists()

    def test_tmp_and_retired_prefers_merge_then_drops_retired(self, tmp_path):
        """THE real mid-swap crash window: live renamed away, merge never
        renamed in. The merge (a complete, committed rewrite) wins; the
        retired spine is dropped only after the rename lands."""
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials_compacting", {"batch_id=1": "merged"})
        _mk(tmp_path, "partials_retired", {"batch_id=0": "a", "batch_id=1": "b"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=1": "merged"}
        assert not tmp.exists() and not retired.exists()

    def test_live_and_tmp_leaves_abandoned_merge(self, tmp_path):
        """Crash after the merge was staged but before any rename: the
        live spine is complete — the abandoned merge must NOT replace it
        (the next compaction overwrites tmp anyway)."""
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials", {"batch_id=0": "a", "batch_id=1": "b"})
        _mk(tmp_path, "partials_compacting", {"batch_id=1": "merged"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=0": "a", "batch_id=1": "b"}
        assert tmp.is_dir()  # left for the next compaction to overwrite

    def test_live_and_retired_drops_retired(self, tmp_path):
        """Crash after the final rename but before cleanup: live IS the
        merge; retired is subsumed."""
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials", {"batch_id=1": "merged"})
        _mk(tmp_path, "partials_retired", {"batch_id=0": "a", "batch_id=1": "b"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=1": "merged"}
        assert not retired.exists()

    def test_all_three_merges_tmp_into_live(self, tmp_path):
        """The pre-fix damage state: an old append re-created live
        mid-swap with only post-crash batches. The merged generations
        move in next to them; nothing is lost."""
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials", {"batch_id=2": "new-batch"})
        _mk(tmp_path, "partials_compacting", {"batch_id=1": "merged"})
        _mk(tmp_path, "partials_retired", {"batch_id=0": "a", "batch_id=1": "b"})
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=1": "merged", "batch_id=2": "new-batch"}
        assert not tmp.exists() and not retired.exists()

    def test_all_three_with_generation_collision_raises(self, tmp_path):
        """A generation present in BOTH the recreated live dir and the
        merge means an id at/below the watermark was re-appended — the
        store is corrupt and heal must refuse to guess."""
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials", {"batch_id=1": "imposter"})
        _mk(tmp_path, "partials_compacting", {"batch_id=1": "merged"})
        _mk(tmp_path, "partials_retired", {"batch_id=0": "a"})
        with pytest.raises(RuntimeError, match="refusing to guess"):
            heal_interrupted_swap(live, tmp, retired)
        # nothing was deleted by the failed heal
        assert _gens(retired) == {"batch_id=0": "a"}
        assert _gens(tmp) == {"batch_id=1": "merged"}

    def test_heal_is_idempotent(self, tmp_path):
        live, tmp, retired = self._paths(tmp_path)
        _mk(tmp_path, "partials_compacting", {"batch_id=1": "merged"})
        _mk(tmp_path, "partials_retired", {"batch_id=0": "a"})
        for _ in range(3):
            heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == {"batch_id=1": "merged"}


class TestMarkersAndWatermark:
    def test_marker_roundtrip(self, tmp_path):
        base = str(tmp_path)
        assert marker_ids(base) == []
        for b in (3, -1, 0):
            marker_path(base, b).mkdir(parents=True)
        assert marker_ids(base) == [-1, 0, 3]

    def test_watermark_and_collapse(self, tmp_path):
        base = str(tmp_path)
        assert compaction_watermark(base) is None
        for b in (-2, 0, 1, 2, 5):
            marker_path(base, b).mkdir(parents=True)
        write_watermark(base, 1)
        write_watermark(base, 2)
        assert compaction_watermark(base) == 2
        collapse_stream_markers(base, 2, keep_negative=True)
        # negative erasure tombstone survives; stream markers <= 2 collapse;
        # older watermark dirs collapse
        assert marker_ids(base) == [-2, 5]
        assert compaction_watermark(base) == 2
        collapse_stream_markers(base, 2, keep_negative=False)
        assert marker_ids(base) == [5]

    def test_cell_swap_sweep(self, tmp_path):
        corpus = tmp_path / "corpus"
        cell = corpus / "cluster_id=0"
        for gen, content in (("batch_id=0", "old0"), ("batch_id=1", "old1")):
            (cell / gen).mkdir(parents=True)
            (cell / gen / "f").write_text(content)
        (cell / "_merged_hi_1").mkdir()
        (cell / "_merged_hi_1" / "f").write_text("merged")
        other = corpus / "cluster_id=1" / "batch_id=0"
        other.mkdir(parents=True)
        (other / "f").write_text("untouched")
        assert finish_pending_cell_swaps(corpus) == 1
        assert (cell / "batch_id=1" / "f").read_text() == "merged"
        assert not (cell / "batch_id=0").exists()
        assert (other / "f").read_text() == "untouched"
        # idempotent / no-op on a clean corpus
        assert finish_pending_cell_swaps(corpus) == 0
        finish_cell_swap(cell)  # direct no-op
        assert (cell / "batch_id=1" / "f").read_text() == "merged"


class TestSwapCrashSteps:
    """Simulate the REAL swap sequence (write tmp → watermark → retire →
    rename-in → cleanup) interrupted after every step; after heal, the
    store must always serve exactly the committed content — merged or
    original per-batch form, never a mix, never a loss."""

    STEPS = 5

    def _run_until(self, base: pathlib.Path, crash_after: int):
        live = base / "partials"
        tmp = base / "partials_compacting"
        retired = base / "partials_retired"
        _mk(base, "partials", {"batch_id=0": "a", "batch_id=1": "b"})
        for b in (0, 1):
            marker_path(str(base), b).mkdir(parents=True)
        steps = [
            lambda: _mk(base, "partials_compacting", {"batch_id=1": "a+b"}),
            lambda: write_watermark(str(base), 1),
            lambda: live.rename(retired),
            lambda: tmp.rename(live),
            lambda: __import__("shutil").rmtree(retired),
        ]
        for step in steps[:crash_after]:
            step()
        return live, tmp, retired

    @pytest.mark.parametrize("crash_after", range(1, 6))
    def test_heal_preserves_committed_content(self, tmp_path, crash_after):
        live, tmp, retired = self._run_until(tmp_path, crash_after)
        heal_interrupted_swap(live, tmp, retired)
        gens = _gens(live)
        if crash_after <= 2:
            # swap never started: the original spine is authoritative
            assert gens == {"batch_id=0": "a", "batch_id=1": "b"}
        else:
            # the merge is authoritative once the live dir was retired
            assert gens == {"batch_id=1": "a+b"}
        assert not retired.exists()
        # idempotent: a second heal changes nothing
        heal_interrupted_swap(live, tmp, retired)
        assert _gens(live) == gens


class TestSwapLock:
    """Per-store swap lock (ADVICE r11): heal and compaction serialize so
    a healer can never rmtree a merged generation a live compactor just
    renamed in — the r11 TOCTOU. Covers acquire/release, skip-when-held
    (the serve-path reaction), dead-owner stealing, and the
    finish_pending_cell_swaps skip."""

    def test_acquire_creates_and_releases_lockdir(self, tmp_path):
        from scala_etl_test_spark.streaming.compaction import swap_lock

        with swap_lock(tmp_path) as acquired:
            assert acquired is True
            assert (tmp_path / "_SWAPLOCK" / "pid").is_file()
        assert not (tmp_path / "_SWAPLOCK").exists()

    def test_nonblocking_skips_while_held_in_process(self, tmp_path):
        import threading

        from scala_etl_test_spark.streaming.compaction import swap_lock

        entered = threading.Event()
        release = threading.Event()
        observed = []

        def holder():
            with swap_lock(tmp_path):
                entered.set()
                release.wait(timeout=30)

        t = threading.Thread(target=holder)
        t.start()
        try:
            assert entered.wait(timeout=30)
            with swap_lock(tmp_path, wait=False) as acquired:
                observed.append(acquired)
        finally:
            release.set()
            t.join(timeout=30)
        assert observed == [False]
        # once the holder exits, acquisition succeeds again
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is True

    def test_live_foreign_owner_blocks_nonblocking_and_times_out(self, tmp_path):
        from scala_etl_test_spark.streaming.compaction import swap_lock

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("1")  # init: alive, never ours
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is False
        with pytest.raises(TimeoutError):
            with swap_lock(tmp_path, wait=True, timeout=0.3, poll=0.05):
                pass
        assert (lockdir / "pid").read_text() == "1"  # never stolen

    def test_dead_owner_lock_is_stolen(self, tmp_path):
        import subprocess

        from scala_etl_test_spark.streaming.compaction import swap_lock

        proc = subprocess.Popen(["true"])
        proc.wait()
        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text(str(proc.pid))
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is True
        assert not lockdir.exists()

    def test_finish_pending_cell_swaps_skips_under_live_lock(self, tmp_path):
        """The serve-path healer must NOT touch a staged swap while a live
        owner holds the store — exactly the r11 TOCTOU window."""
        corpus = tmp_path / "corpus"
        cell = _mk(corpus, "cluster_id=7", {"batch_id=0": "a", "batch_id=1": "b"})
        _mk(corpus, "cluster_id=7/_merged_hi_1", {})
        (cell / "_merged_hi_1" / "part-0.parquet").write_text("a+b")

        lockdir = corpus / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("1")  # simulated live compactor
        assert finish_pending_cell_swaps(corpus) == 0
        # nothing moved: staged merge still invisible, raw gens intact
        assert (cell / "_merged_hi_1").is_dir()
        assert (cell / "batch_id=0").is_dir() and (cell / "batch_id=1").is_dir()

        # owner "finishes": once the lock is gone the sweep heals normally
        import shutil

        shutil.rmtree(lockdir)
        assert finish_pending_cell_swaps(corpus) == 1
        assert _gens(cell) == {"batch_id=1": "a+b"}


class TestSwapLockConcurrency:
    """Post-cert hardening: REAL concurrent healers (threads), not
    simulated owners. Without the swap lock, parallel
    finish_pending_cell_swaps calls reproduce the r11 TOCTOU with
    measurable probability (one healer's delete loop destroys the merged
    generation another just renamed in); with it, the committed content
    survives every iteration."""

    def test_parallel_healers_never_lose_the_merge(self, tmp_path):
        import concurrent.futures
        import shutil

        for i in range(20):
            corpus = tmp_path / f"corpus{i}"
            cell = _mk(
                corpus, "cluster_id=1", {"batch_id=0": "a", "batch_id=1": "b"}
            )
            staged = cell / "_merged_hi_1"
            staged.mkdir()
            (staged / "part-0.parquet").write_text("a+b")

            with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
                healed = list(
                    ex.map(lambda _: finish_pending_cell_swaps(corpus), range(8))
                )
            # exactly one healer wins; skippers report 0 (live owner) —
            # and NOBODY deletes the only committed copy
            assert sum(healed) == 1, healed
            assert _gens(cell) == {"batch_id=1": "a+b"}
            shutil.rmtree(corpus)

    def test_lock_released_on_exception(self, tmp_path):
        from scala_etl_test_spark.streaming.compaction import swap_lock

        with pytest.raises(RuntimeError, match="boom"):
            with swap_lock(tmp_path):
                raise RuntimeError("boom")
        assert not (tmp_path / "_SWAPLOCK").exists()
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is True

    def test_reacquire_after_skip_path(self, tmp_path):
        """A wait=False miss must leave both lock layers clean — the
        in-process lock especially (an unreleased threading lock would
        deadlock every later compaction of the same store)."""
        import threading

        from scala_etl_test_spark.streaming.compaction import swap_lock

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("1")
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is False
        import shutil

        shutil.rmtree(lockdir)

        got = []

        def worker():
            with swap_lock(tmp_path, wait=True, timeout=5) as a:
                got.append(a)

        t = threading.Thread(target=worker)
        t.start()
        t.join(timeout=30)
        assert got == [True]


class TestSwapLockHardening:
    """ADVICE r12 closures + the VERDICT r12 item-7 lease variant.

    1. Atomic acquisition: the owner token is staged and renamed in, so
       no crash window can leave a pid-less HELD lock; release renames
       out before deleting, so normal release has no token-less window
       either. A token-less lockdir is therefore always crash debris —
       held inside _ORPHAN_GRACE (a token may be in flight), stealable
       past it.
    2. Pid-reuse: the token records /proc start time; a live pid with a
       DIFFERENT start time is a recycled pid, i.e. a dead owner.
    3. Single deadline: wait=True spends at most ~timeout total across
       the in-process acquire and the fs loop, not ~2x.
    4. Lease mode: liveness = token mtime age vs TTL (shared-fs variant
       where pids mean nothing); refresh_swap_lock extends it.
    """

    def test_tokenless_lockdir_is_held_within_grace(self, tmp_path):
        from scala_etl_test_spark.streaming.compaction import swap_lock

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)  # fresh mtime, no token
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is False
        assert lockdir.is_dir()

    def test_tokenless_lockdir_is_stolen_past_grace(self, tmp_path):
        import os
        import time

        from scala_etl_test_spark.streaming.compaction import swap_lock

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        old = time.time() - 3600
        os.utime(lockdir, (old, old))
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is True
            # and the fresh lock carries a pid:starttime token
            assert (lockdir / "pid").read_text().split(":")[0] == str(os.getpid())
        assert not lockdir.exists()

    def test_recycled_pid_is_treated_as_dead(self, tmp_path):
        """A token whose pid is LIVE but whose recorded start time differs
        from the process currently wearing that pid is a dead owner."""
        import os

        from scala_etl_test_spark.streaming import compaction
        from scala_etl_test_spark.streaming.compaction import swap_lock

        me = os.getpid()
        real_start = compaction._proc_start_token(me)
        if real_start is None:
            pytest.skip("no /proc start tokens on this platform")
        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text(f"{me}:{int(real_start) + 12345}")
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is True
        # matching start time = genuinely live owner: held
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("1:" + (compaction._proc_start_token(1) or ""))
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is False

    def test_wait_true_single_deadline(self, tmp_path):
        """Total blocking stays ~timeout even when the fs lock is what's
        contended (previously the fs loop got a fresh full budget)."""
        import time

        from scala_etl_test_spark.streaming.compaction import swap_lock

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("1")  # live foreign owner
        t0 = time.monotonic()
        with pytest.raises(TimeoutError):
            with swap_lock(tmp_path, wait=True, timeout=0.5, poll=0.05):
                pass
        elapsed = time.monotonic() - t0
        assert elapsed < 1.0, elapsed  # one budget, not two

    def test_lease_mode_fresh_token_held_expired_stolen(self, tmp_path):
        import os
        import time

        from scala_etl_test_spark.streaming.compaction import swap_lock

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        # pid is DEAD but the lease is fresh: lease mode must hold (pids
        # mean nothing on a shared fs — mtime is the only signal)
        (lockdir / "pid").write_text("999999999:")
        with swap_lock(tmp_path, wait=False, lease_ttl=30.0) as acquired:
            assert acquired is False
        # expire the lease: stealable even though the pid check is moot
        old = time.time() - 60
        os.utime(lockdir / "pid", (old, old))
        with swap_lock(tmp_path, wait=False, lease_ttl=30.0) as acquired:
            assert acquired is True
        assert not lockdir.exists()

    def test_lease_refresh_extends_ownership(self, tmp_path):
        import os
        import time

        from scala_etl_test_spark.streaming.compaction import (
            refresh_swap_lock,
            swap_lock,
        )

        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("999999999:")
        old = time.time() - 60
        os.utime(lockdir / "pid", (old, old))
        refresh_swap_lock(tmp_path)  # owner keep-alive brings mtime current
        with swap_lock(tmp_path, wait=False, lease_ttl=30.0) as acquired:
            assert acquired is False
        # refresh of an unheld store is a silent no-op
        refresh_swap_lock(tmp_path / "nonexistent")

    def test_default_lease_ttl_switches_mode_globally(self, tmp_path, monkeypatch):
        """Deployments set DEFAULT_LEASE_TTL once; every swap_lock call —
        including the ones buried in serve/append healers — then runs in
        lease mode without plumbing a kwarg through."""
        from scala_etl_test_spark.streaming import compaction
        from scala_etl_test_spark.streaming.compaction import swap_lock

        monkeypatch.setattr(compaction, "DEFAULT_LEASE_TTL", 30.0)
        lockdir = tmp_path / "_SWAPLOCK"
        lockdir.mkdir(parents=True)
        (lockdir / "pid").write_text("999999999:")  # dead pid, fresh lease
        with swap_lock(tmp_path, wait=False) as acquired:
            assert acquired is False

    def test_parallel_healers_never_lose_the_merge_lease_mode(
        self, tmp_path, monkeypatch
    ):
        """The r11 TOCTOU hammer, re-run with the lock in LEASE mode —
        the variant the stores would use on a shared filesystem."""
        import concurrent.futures
        import shutil

        from scala_etl_test_spark.streaming import compaction

        monkeypatch.setattr(compaction, "DEFAULT_LEASE_TTL", 30.0)
        for i in range(10):
            corpus = tmp_path / f"corpus{i}"
            cell = _mk(
                corpus, "cluster_id=1", {"batch_id=0": "a", "batch_id=1": "b"}
            )
            staged = cell / "_merged_hi_1"
            staged.mkdir()
            (staged / "part-0.parquet").write_text("a+b")

            with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
                healed = list(
                    ex.map(lambda _: finish_pending_cell_swaps(corpus), range(8))
                )
            assert sum(healed) == 1, healed
            assert _gens(cell) == {"batch_id=1": "a+b"}
            shutil.rmtree(corpus)
