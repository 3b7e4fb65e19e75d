"""Streaming maintenance of the persisted IVF ANN index — the missing
quadrant of the ANN artifact's lifecycle (beyond-reference; the batch
pieces live in operators/similarity.py):

- **build**: ``ivf_assign`` + ``partitionBy(cluster_id)`` (write-time
  partition key, plan-gated pruning);
- **serve**: ``ivf_topk`` over the partitioned corpus — nprobe cells of
  partition pruning, not a scan;
- **append (this module)**: each micro-batch of new embeddings is assigned
  to its cell (narrow row-local argmax against the FROZEN centroid set)
  and appended under ``cluster_id=K/batch_id=N/`` — per-batch work is
  O(batch·k) compute + an O(batch) write, INDEPENDENT of corpus size
  (``tools/stress_streaming.py --twin ann_append`` pins the flat trend);
- **erase**: ``forget_from_ivf`` with ``sub_partition_cols=["batch_id"]``
  — cell-local rewrite that preserves the delta spine.

Centroids are frozen at index creation (the standard IVF contract:
retraining re-clusters the corpus, which is an offline rebuild, not
maintenance) and stored as a parquet sidecar, so any session — including
a restarted stream — assigns against the identical cell geometry.

Exactly-once: the corpus dir itself cannot say whether batch N fully
committed (a crashed job leaves partials; an erased batch leaves
nothing), so a marker under ``_APPENDLOG/`` — written only AFTER the
data job commits — is the replay guard. A replayed batch whose marker
exists is SKIPPED (this is also what keeps a fully-erased batch from
resurrecting forgotten vectors on replay); a replayed batch whose marker
is missing first WIPES any partial ``batch_id=N`` remnants, then
re-appends — idempotent under a crash on either side of the marker.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession, functions as F


def _centroids_dir(index_dir: str) -> str:
    return str(pathlib.Path(index_dir) / "centroids")


def _corpus_dir(index_dir: str) -> str:
    return str(pathlib.Path(index_dir) / "corpus")


def _marker(index_dir: str, batch_id: int) -> pathlib.Path:
    return pathlib.Path(index_dir) / "_APPENDLOG" / f"batch_id={batch_id}"


def init_ivf_index(
    spark: SparkSession,
    index_dir: str,
    seed: DataFrame,
    n_centroids: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index at ``index_dir``: frozen centroids
    (stride-seeded here; any (centroid_id, centroid_vec) frame drops in)
    and the seed corpus partitioned by cell with the ``batch_id=-1``
    delta spine the appends will extend."""
    from scala_etl_test_spark.operators.similarity import ivf_assign, stride_centroids

    cents = stride_centroids(seed, n_centroids, vec_col=vec_col, id_col=id_col)
    cents.write.mode("errorifexists").parquet(_centroids_dir(index_dir))
    (
        ivf_assign(seed, read_centroids(spark, index_dir), vec_col=vec_col, id_col=id_col)
        .withColumn("batch_id", F.lit(-1))
        .write.partitionBy("cluster_id", "batch_id")
        .parquet(_corpus_dir(index_dir))
    )
    _marker(index_dir, -1).mkdir(parents=True, exist_ok=True)


def read_centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_centroids_dir(index_dir))


def read_ivf_corpus(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(_corpus_dir(index_dir))


def append_batch_to_ivf(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    batch_id: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> bool:
    """The per-micro-batch body: assign against the frozen centroids and
    append under the batch's delta dirs. Returns False (no-op) when the
    batch's marker says it already committed — the replay guard. Public
    (not a closure) so replay/crash paths are directly testable."""
    marker = _marker(index_dir, batch_id)
    if marker.exists():
        return False
    corpus = pathlib.Path(_corpus_dir(index_dir))
    # wipe partial remnants of a crashed earlier attempt BEFORE re-appending
    for leftover in corpus.glob(f"cluster_id=*/batch_id={batch_id}"):
        import shutil

        shutil.rmtree(leftover, ignore_errors=True)
    from scala_etl_test_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(
        batch, read_centroids(spark, index_dir), vec_col=vec_col, id_col=id_col
    )
    (
        assigned.withColumn("batch_id", F.lit(batch_id))
        .write.mode("append")
        .partitionBy("cluster_id", "batch_id")
        .parquet(str(corpus))
    )
    marker.mkdir(parents=True, exist_ok=True)
    return True


def stream_append_ivf(
    changes: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Start (availableNow) the continuous IVF maintenance stream: each
    micro-batch of new embeddings lands cell-routed in the partitioned
    corpus. The checkpoint dedups source files; the _APPENDLOG marker
    dedups the append itself (module docstring)."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        append_batch_to_ivf(
            batch_df.sparkSession, index_dir, batch_df, int(batch_id), vec_col, id_col
        )

    return (
        changes.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ivf_index_topk(
    spark: SparkSession,
    index_dir: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve path over the maintained index: probe ``nprobe`` cells of the
    partitioned corpus (partition pruning carries the cell predicate —
    same plan the batch ``ivf_topk`` gate pins) against the frozen
    centroids."""
    from scala_etl_test_spark.operators.similarity import ivf_topk

    return ivf_topk(
        read_ivf_corpus(spark, index_dir),
        read_centroids(spark, index_dir),
        query,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
    )


def forget_from_ivf_index(
    spark: SparkSession,
    index_dir: str,
    forget_ids: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """Erasure over the maintained index: the batch cell-local rewrite
    (operators/similarity.py:forget_from_ivf) with the delta spine
    preserved, so committed-batch markers stay valid and a replay of a
    fully-erased batch cannot resurrect forgotten vectors (the marker,
    not the data dir, is the replay guard)."""
    from scala_etl_test_spark.operators.similarity import forget_from_ivf

    return forget_from_ivf(
        spark,
        _corpus_dir(index_dir),
        forget_ids,
        id_col=id_col,
        sub_partition_cols=["batch_id"],
    )
