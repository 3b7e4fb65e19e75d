"""Sparse-retrieval scoring operators (beyond-reference, training-data tier).

BM25 ranking over the corpus — the standard first-stage retriever for
retrieval-based decontamination ("is this eval question answerable verbatim
from the corpus?"), nearest-document audits, and quality-weighted corpus
curation. Complements the dense path in :mod:`operators.similarity`
(cosine/IVF/LSH): production decontamination runs both and unions hits.

Scale shape (deliberate — this is why there is no explode here): term
frequencies for a *fixed, small* query-term set are computed row-locally
with array ``filter``/``size`` over the normalized word array, so the whole
per-document stage is one scan inside whole-stage codegen with **zero
shuffles**. Corpus statistics (N, avgdl, per-term document frequency) are
one single-row global aggregate broadcast back with a cross join — at
100 TB that is one map-side-combined reduction to one row, not a join on a
vocab-sized table (contrast ``docs_top_terms``, which ranks over the *full*
vocabulary and therefore pays the (doc, word) shuffle). Top-k is
``orderBy().limit(k)`` → TakeOrderedAndProject: per-partition heaps of k,
one k-row merge on the driver side of the exchange, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from scala_etl_test_spark.caching import tracked_persist

from scala_etl_test_spark.operators.dedup import words

# Okapi BM25 defaults (Robertson & Zaragoza 2009, the Lucene parametrization).
BM25_K1 = 1.2
BM25_B = 0.75


def _idf(df_t: Column, n: Column) -> Column:
    """Lucene-form BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    positive, so a term present in every document still contributes rank
    signal instead of flipping the score negative (classic Okapi idf goes
    negative for df > N/2, which a 30-word synthetic vocabulary would hit)."""
    return F.log(F.lit(1.0) + (n - df_t + F.lit(0.5)) / (df_t + F.lit(0.5)))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by BM25 score against a bag of query terms.

    Returns (id_col, bm25 double rounded to 6, rank int). Ordering — and
    therefore the cross-engine oracle comparison — is on the *rounded*
    score with ``id_col`` as the deterministic tie-break, so ULP-level
    ``ln`` / summation-order differences between engines cannot flip ranks.

    Only documents matching at least one query term are candidates
    (``score > 0``), matching what an inverted-index retriever would
    surface.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    tf_cols = {t: f"tf_{i}" for i, t in enumerate(query_terms)}

    def _eq(term: str):
        # NB: a two-arg lambda would be read by F.filter as (element, index),
        # so bind the term via closure, not a default argument.
        return lambda x: x == F.lit(term)

    # Persisted because it feeds both the corpus-stats aggregate and the
    # scoring pass: one scan of the wide text column, and the cached frame
    # is narrow (id + a handful of ints), so at 100 TB the cache is ~1% of
    # the input, not a second corpus read.
    per_doc = docs.select(
        F.col(id_col),
        F.size(F.filter(words(text_col), lambda x: x != "")).alias("dl"),
        *[
            F.size(F.filter(words(text_col), _eq(t))).alias(c)
            for t, c in tf_cols.items()
        ],
    ).transform(tracked_persist)

    # One single-row corpus aggregate: N, avgdl, df per query term. Map-side
    # partial aggregation reduces this to one row per task before the
    # single-partition exchange; the cross join below is a 1-row broadcast.
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(c) > 0).cast("long")).cast("double").alias(f"df_{c}")
            for c in tf_cols.values()
        ],
    )

    norm = F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    score = None
    for c in tf_cols.values():
        tf = F.col(c).cast("double")
        term_score = _idf(F.col(f"df_{c}"), F.col("n_docs")) * (
            tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm)
        )
        score = term_score if score is None else score + term_score

    scored = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
    )
    topk = scored.orderBy(F.col("bm25").desc(), F.col(id_col).asc()).limit(k)
    # rank over the k surviving rows only — single tiny partition, not a
    # corpus-wide window.
    win = Window.orderBy(F.col("bm25").desc(), F.col(id_col).asc())
    return topk.withColumn("rank", F.row_number().over(win).cast("int"))
