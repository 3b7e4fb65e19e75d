"""Streaming CDC upsert: maintain a keyed SCD-1 state table from a change
stream via ``foreachBatch`` + the batch MERGE (operators/merge.py:upsert).

This is the standard Structured-Streaming pattern for sinks without
native MERGE (plain parquet here; Delta/Iceberg swap in transparently):
each micro-batch's changes collapse to latest-per-key and merge into the
persisted table, and the CHECKPOINT makes the composition exactly-once —
a replayed batch re-merges the same collapsed updates idempotently.

With a ``version_col`` the merge is VERSION-AWARE (state ∪ batch →
latest-per-key): a late micro-batch carrying older versions cannot
regress state, so the final table equals latest-per-key over the whole
feed in ANY arrival order. Without one, arrival order wins (plain SCD-1
batch-replaces-base), the honest contract when the feed carries no
ordering information.

Two-generation table layout: ``foreachBatch`` cannot overwrite the
directory it is reading as the merge base (the read is lazy; overwriting
mid-plan corrupts it), so each merge writes generation ``g+1`` and a
MANIFEST pointer flips atomically afterwards — the same
write-new-then-flip-pointer move every table format makes transactional,
in miniature. Stale generations are pruned keep-last-2 (the pointed one
plus its predecessor for in-flight readers).

Scale shape: the merge is the batch upsert's plan — anti-join on keys +
union — whose big side is the STATE table; at real scale the state table
is bucketed by key at write time (sources/bucketing.py) so the per-batch
anti-join co-locates instead of reshuffling the full state, or the sink
is a format with native MERGE. The per-batch work is proportional to
state size + batch size, never history size.
"""

from __future__ import annotations

import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession

from scala_etl_test_spark.operators.merge import latest_per_key, upsert


def _gen_dir(table_dir: str, gen: int) -> str:
    return str(pathlib.Path(table_dir) / f"gen={gen}")


def _read_manifest(table_dir: str) -> int:
    mf = pathlib.Path(table_dir) / "MANIFEST"
    return int(mf.read_text()) if mf.exists() else -1


def _write_manifest(table_dir: str, gen: int) -> None:
    mf = pathlib.Path(table_dir) / "MANIFEST"
    tmp = mf.with_suffix(".tmp")
    tmp.write_text(str(gen))
    tmp.replace(mf)  # atomic pointer flip


def read_state(spark: SparkSession, table_dir: str) -> DataFrame | None:
    """Current state table (the generation the MANIFEST points at)."""
    gen = _read_manifest(table_dir)
    if gen < 0:
        return None
    return spark.read.parquet(_gen_dir(table_dir, gen))


def stream_upsert(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    version_col: str | None = None,
):
    """Start (availableNow) a foreachBatch CDC merge of ``changes`` into
    the two-generation table at ``table_dir``. Returns the query handle;
    callers typically ``awaitTermination()``."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        collapsed = latest_per_key(batch_df, key_cols, version_col)
        current_gen = _read_manifest(table_dir)
        if current_gen < 0:
            merged = collapsed
        else:
            base = spark.read.parquet(_gen_dir(table_dir, current_gen))
            if version_col is not None:
                # version-aware: the state row's version competes with the
                # batch's — a LATE micro-batch (older versions arriving
                # after newer state) must NOT regress the state, which
                # plain upsert's batch-always-wins replace would do
                merged = latest_per_key(
                    base.unionByName(collapsed), key_cols, version_col
                )
            else:
                # no version column: arrival order IS the order (SCD-1
                # batch-wins), the documented at-least-once contract
                merged = upsert(base, collapsed, key_cols, version_col)
        new_gen = current_gen + 1
        merged.write.mode("overwrite").parquet(_gen_dir(table_dir, new_gen))
        _write_manifest(table_dir, new_gen)
        # keep-last-2 pruning: the pointer target and its predecessor
        for old in pathlib.Path(table_dir).glob("gen=*"):
            g = int(old.name.split("=", 1)[1])
            if g < new_gen - 1:
                shutil.rmtree(old, ignore_errors=True)

    return (
        changes.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
