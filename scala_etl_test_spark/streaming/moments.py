"""Streaming maintenance of exact covariance moments.

The batch operator (operators/similarity.py:embedding_covariance) reduces
the corpus to INTEGER moment sums and divides once at the end — and integer
sums are exactly mergeable (associative + commutative), the same algebra
that makes the HLL/CMS/histogram tier a streaming citizen. So the streaming
twin appends each micro-batch's partial moment table (pair sums, first
moments, row count — all int64/DECIMAL(38,0)) under a ``batch_id=N`` delta
spine, and serve-time covariance is ONE bounded merge: a groupBy-SUM over
≤ batches × (d(d+1)/2 + d + 1) rows — d²-scale, independent of how many
vectors ever streamed — followed by the batch operator's own finalization.
The served matrix is therefore BIT-IDENTICAL to running the batch operator
over the union of all batches (test-pinned): no float enters before the
single final division, so merge order cannot matter.

Exactly-once: the ``_APPENDLOG`` marker protocol of streaming/ann.py — the
marker is written only AFTER the partials' write commits, so a replayed
committed batch is a no-op and a crashed partial append is wiped and
redone. Work per batch is O(batch_rows × d²) map-side + one d²-bounded
shuffle; serve cost never grows with stream length beyond the batch count
in the delta spine (compact by re-writing merged partials under a single
batch dir if that ever matters — the merge IS the compaction).

Partial-table layout: one parquet table with rows
``(kind ∈ {pair, first, n}, i, j, val DECIMAL(38,0))`` — pair rows carry
(i=dim_i, j=dim_j, val=Σ q_i·q_j), first rows (i=dim, j=-1, val=Σ q_i),
and the single n row (i=-1, j=-1, val=row count).
"""

from __future__ import annotations

import pathlib
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from scala_etl_test_spark.operators.similarity import (
    finalize_covariance,
    first_moments,
    quantized_base,
    second_moments,
)

MOMENTS_SCALE = 1_000_000


def _partials_dir(moments_dir: str) -> str:
    return f"{moments_dir}/partials"


def _marker(moments_dir: str, batch_id: int) -> pathlib.Path:
    return pathlib.Path(moments_dir) / "_APPENDLOG" / f"batch_id={batch_id}"


def batch_moment_partials(
    batch: DataFrame, vec_col: str = "embedding", scale: int = MOMENTS_SCALE
) -> DataFrame:
    """One micro-batch reduced to its long-form partial moments — built
    from the SAME quantize/pair-product expressions as the batch operator
    (operators/similarity.py:quantized_base/second_moments/first_moments),
    which is the whole bit-identity argument."""
    base = quantized_base(batch, vec_col, scale)
    pairs = second_moments(base).select(
        F.lit("pair").alias("kind"),
        F.col("dim_i").alias("i"),
        F.col("dim_j").alias("j"),
        F.col("_s_ij").alias("val"),
    )
    firsts = first_moments(base).select(
        F.lit("first").alias("kind"),
        F.col("dim").alias("i"),
        F.lit(-1).cast("long").alias("j"),
        F.col("_s").alias("val"),
    )
    # count ONLY rows that contribute moments (non-null, non-empty vectors)
    # — the batch operator's per-pair _n is the count of contributing rows,
    # so a NULL-embedding row in a batch must not skew the streamed
    # denominator. (Both operators assume fixed dimensionality; variable-
    # length vectors are outside the covariance contract entirely.)
    n = (
        base.filter(F.col("_q").isNotNull() & (F.size("_q") > 0))
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("val"))
        .select(
            F.lit("n").alias("kind"),
            F.lit(-1).cast("long").alias("i"),
            F.lit(-1).cast("long").alias("j"),
            F.col("val"),
        )
    )
    return pairs.unionByName(firsts).unionByName(n)


def append_batch_moments(
    spark: SparkSession,
    moments_dir: str,
    batch: DataFrame,
    batch_id: int,
    vec_col: str = "embedding",
    scale: int = MOMENTS_SCALE,
) -> bool:
    """The per-micro-batch body: reduce the batch to its partial moments
    and append them under ``batch_id=N``. Returns False (no-op) when the
    batch's marker says it already committed — the replay guard. Public
    so replay/crash paths are directly testable."""
    marker = _marker(moments_dir, batch_id)
    if marker.exists():
        return False
    # wipe partial remnants of a crashed earlier attempt BEFORE re-appending
    leftover = pathlib.Path(_partials_dir(moments_dir)) / f"batch_id={batch_id}"
    shutil.rmtree(leftover, ignore_errors=True)
    (
        batch_moment_partials(batch, vec_col, scale)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("append")
        .partitionBy("batch_id")
        .parquet(_partials_dir(moments_dir))
    )
    marker.mkdir(parents=True, exist_ok=True)
    return True


def stream_covariance(
    changes: DataFrame,
    moments_dir: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    scale: int = MOMENTS_SCALE,
):
    """Start (availableNow) the continuous moment-maintenance stream: the
    checkpoint dedups source files; the _APPENDLOG marker dedups the
    append itself (module docstring)."""

    def _append(batch_df: DataFrame, batch_id: int) -> None:
        append_batch_moments(
            batch_df.sparkSession, moments_dir, batch_df, int(batch_id), vec_col, scale
        )

    return (
        changes.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_covariance(
    spark: SparkSession,
    moments_dir: str,
    scale: int = MOMENTS_SCALE,
    round_digits: int = 9,
) -> DataFrame | None:
    """Serve the covariance from the accumulated partials: merge (exact
    integer groupBy-SUM, d²-bounded) then the batch operator's own
    finalization. None when no batch has ever committed."""
    pdir = _partials_dir(moments_dir)
    # never-written store → None; a CORRUPT store must raise, not read as
    # "no data" (a broad except here would silently serve an empty matrix)
    if not pathlib.Path(pdir).is_dir():
        return None
    partials = spark.read.parquet(pdir)
    merged = partials.groupBy("kind", "i", "j").agg(F.sum("val").alias("val"))
    n_df = merged.filter(F.col("kind") == "n").select(
        F.col("val").cast("long").alias("_n")
    )
    second = (
        merged.filter(F.col("kind") == "pair")
        .select(
            F.col("i").alias("dim_i"),
            F.col("j").alias("dim_j"),
            F.col("val").cast("decimal(38,0)").alias("_s_ij"),
        )
        .join(F.broadcast(n_df))
    )
    firsts = merged.filter(F.col("kind") == "first").select(
        F.col("i").alias("dim"), F.col("val").cast("decimal(38,0)").alias("_s")
    )
    return finalize_covariance(second, firsts, scale, round_digits)
