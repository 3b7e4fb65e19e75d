"""Item-to-item collaborative filtering: the item-kNN neighbor graph from
basket co-occurrence (Sarwar et al. 2001; the "customers who bought X also
bought Y" primitive).

Distinct from the market-basket query (plans/queries.py:q_copurchase_pairs,
which thresholds pairs by support and reports LIFT): this operator emits the
top-k NEAREST NEIGHBORS per item under COSINE over binary basket-incidence
vectors — the precomputed similarity table an item-based recommender serves
lookups from.

cosine(i, j) = |baskets(i) ∩ baskets(j)| / sqrt(|baskets(i)|·|baskets(j)|)

Scale shape: pair generation is a self-join keyed on the basket id, so the
fanout of a basket with k items is k²/2 — the ONLY skew threat. The
``basket_cap`` guard drops baskets above the cap BEFORE the join (the
standard power-basket pruning; a 10⁴-item basket contributes 10⁸ pairs and
~zero signal). Everything downstream is bounded: per-pair counts partially
aggregate map-side, per-item totals broadcast back, and the per-item top-k
is a WindowGroupLimit (rank ≤ k prunes before the sort completes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from scala_etl_test_spark.caching import tracked_persist


def item_item_cosine(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_k: int = 5,
    basket_cap: int = 1000,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``top_k`` cosine neighbors per item from basket co-occurrence.

    Baskets holding more than ``basket_cap`` distinct items are excluded
    entirely (documented recall tradeoff — their pair fanout is quadratic
    and their signal is diluted by construction). Pairs co-occurring in
    fewer than ``min_support`` baskets are dropped before ranking.

    Determinism: the neighbor ranking orders by the ROUNDED cosine (both
    engines see identical doubles, but rounding first collapses near-ties
    into the explicit id tie-break), then neighbor id.

    Returns (item, neighbor, co_baskets, cosine, rank), rank 1..top_k.
    """
    bi = df.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    sizes = bi.groupBy("_b").agg(F.count(F.lit(1)).alias("_sz"))
    kept = bi.join(
        sizes.filter(F.col("_sz") <= basket_cap).select("_b"), on="_b"
    )
    kept = kept.transform(tracked_persist)  # feeds the self-join twice and the item totals
    a = kept.select("_b", F.col("_i").alias("i"))
    b = kept.select("_b", F.col("_i").alias("j"))
    co = (
        a.join(b, on="_b")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("co_baskets"))
        .filter(F.col("co_baskets") >= min_support)
    )
    item_n = kept.groupBy("_i").agg(F.count(F.lit(1)).alias("n"))
    # symmetrize with one explode pass — a union of co with its swap would
    # run the pair-counting self-join twice (co is unpersisted lineage)
    sym = co.select(
        F.explode(
            F.array(
                F.struct(F.col("i"), F.col("j")),
                F.struct(F.col("j").alias("i"), F.col("i").alias("j")),
            )
        ).alias("_e"),
        "co_baskets",
    ).select(F.col("_e.i").alias("i"), F.col("_e.j").alias("j"), "co_baskets")
    j = (
        sym.join(item_n.select(F.col("_i").alias("i"), F.col("n").alias("n_i")), on="i")
        .join(item_n.select(F.col("_i").alias("j"), F.col("n").alias("n_j")), on="j")
    )
    cos = F.round(
        F.col("co_baskets") / F.sqrt(F.col("n_i") * F.col("n_j")), round_digits
    )
    ranked = j.select(
        F.col("i").alias("item"),
        F.col("j").alias("neighbor"),
        "co_baskets",
        cos.alias("cosine"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("item").orderBy(
                F.col("cosine").desc(), F.col("neighbor").asc()
            )
        ),
    )
    return ranked.filter(F.col("rank") <= top_k)
