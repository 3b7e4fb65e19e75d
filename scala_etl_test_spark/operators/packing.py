"""Sequence packing (beyond-reference; the batch-assembly step of a
training-data pipeline).

Assigns documents to fixed-token-budget packed sequences by cumulative
start offset: stream the docs of a shard in a deterministic order,
concatenate token counts, and a doc whose running start offset falls in
``[k*budget, (k+1)*budget)`` lands in pack ``k``. This is the greedy
concat-and-chunk packing most LLM trainers use (no bin-packing search —
first-fit-decreasing buys ~1-2% density for a nondeterministic layout and a
global sort; the streaming form is reproducible and embarrassingly
shard-parallel).

Scale shape: ONE window (sum over the shard key's ordered stream) — each
shard's packing is independent, so a 100 TB corpus packs as thousands of
parallel per-shard streams. The window's per-shard sort is the data layout
a corpus already has on disk when written by :func:`write_compacted` with
``sort_by`` on the id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from scala_etl_test_spark.functions.cleaning import int_div


def pack_sequences(
    df: DataFrame,
    token_col: Column | str,
    id_col: str,
    shard_col: str,
    budget: int = 512,
) -> DataFrame:
    """Adds ``pack_id`` (per-shard pack index) and ``pack_offset`` (token
    start offset within the pack) for every doc, ordered by ``id_col``
    within each ``shard_col`` partition. Docs longer than ``budget`` simply
    span packs (their successors restart at the next boundary), matching
    chunked-concatenation training."""
    tokens = F.col(token_col) if isinstance(token_col, str) else token_col
    win = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens).over(win) - tokens).cast("long")
    return df.select(
        F.col(id_col),
        F.col(shard_col),
        tokens.cast("long").alias("n_tokens"),
        int_div(start, F.lit(budget)).cast("long").alias("pack_id"),
        (start % budget).cast("long").alias("pack_offset"),
    )


def pack_stats(packed: DataFrame, shard_col: str, budget: int = 512) -> DataFrame:
    """Per-(shard, pack) fill statistics: docs per pack, token total, and
    fill ratio vs the budget — the packing-density report."""
    return packed.groupBy(shard_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.round(F.sum("n_tokens") / F.lit(budget), 6).alias("fill_ratio"),
    )
