"""Continuous corpus dedup: incremental LSH dedup over a document stream.

Each micro-batch dedups against the persisted MinHash/LSH index (probing
only the buckets the batch touches — work ∝ batch size, never corpus size,
see :func:`operators.dedup.incremental_near_duplicates`) and is then
absorbed into the index, so later batches see it. Because every batch
dedups against the-corpus-so-far, the union of all emitted pairs equals
what one full-corpus run would produce — exact streaming/batch
equivalence, test-pinned.

``foreachBatch`` is the right streaming primitive here (not a stateful
operator): the LSH index is far too large for stream state and already
lives as partitioned parquet; each trigger is a bounded batch job against
it. The per-batch sequence — emit pairs, then append the batch's
shingles/bands — is checkpoint-replay-safe in the at-least-once sense:
replaying a batch re-emits the same deterministic pairs (downstream
dedup on (id_a, id_b) makes it exactly-once).

Scale note: index absorption is an append of two small parquet deltas;
compact them periodically (``write_compacted``) so the band table's file
count stays bounded — the probe is an equi-join on (band_idx, band_hash),
which partition-prunes when the index is bucketed on those keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from scala_etl_test_spark.operators.dedup import (
    build_minhash_index,
    incremental_near_duplicates,
)

def init_index(
    spark: SparkSession,
    index_dir: str,
    seed_docs: DataFrame | None,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    shingle_n: int = 3,
) -> None:
    """Materialize the persistent LSH index at ``index_dir`` (shingles/ +
    bands/), from a seed corpus or empty."""
    if seed_docs is not None:
        shingles, band_t = build_minhash_index(
            seed_docs, text_col, id_col, num_hashes, bands, rows, shingle_n
        )
    else:
        shingles = spark.createDataFrame([], f"{id_col} BIGINT, shingle STRING")
        band_t = spark.createDataFrame(
            [], f"{id_col} BIGINT, band_idx INT, band_hash STRING"
        )
    shingles.write.mode("overwrite").parquet(f"{index_dir}/shingles")
    band_t.write.mode("overwrite").parquet(f"{index_dir}/bands")


def stream_incremental_dedup(
    stream_docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    rows: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
):
    """Start (AvailableNow) the streaming dedup: near-dup pairs append to
    ``out_dir`` tagged with their batch id; each batch is absorbed into the
    index after it is deduped against the prior state."""
    spark = stream_docs.sparkSession
    kw = dict(num_hashes=num_hashes, bands=bands, rows=rows, shingle_n=shingle_n)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        idx_shingles = spark.read.parquet(f"{index_dir}/shingles")
        idx_bands = spark.read.parquet(f"{index_dir}/bands")
        pairs = incremental_near_duplicates(
            batch, idx_shingles, idx_bands, text_col, id_col, threshold=threshold, **kw
        )
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)
        # absorb AFTER emitting: the batch deduped against the-corpus-before-it
        new_shingles, new_bands = build_minhash_index(batch, text_col, id_col, **kw)
        new_shingles.write.mode("append").parquet(f"{index_dir}/shingles")
        new_bands.write.mode("append").parquet(f"{index_dir}/bands")

    return (
        stream_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
