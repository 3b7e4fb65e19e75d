"""BPE (byte-pair-encoding) merge training as relational iterations.

Tokenizer training is the last mile of a training-data pipeline, and its
core loop — count adjacent symbol pairs, merge the most frequent, repeat —
is an aggregation workload: after one corpus-sized shuffle to word-type
counts, every BPE iteration runs over the *vocabulary-sized* type table
(Sennrich et al. 2016 train exactly this way). That is the scale story: a
100 TB corpus pays one tokenize+count pass; the k merge iterations then
touch only |vocab| rows regardless of corpus size.

Everything inside an iteration is a row-local higher-order expression
(whole-stage codegen, no UDFs): match positions via ``filter`` over an
index sequence, leftmost non-overlapping occurrence selection via an
``aggregate`` fold with a struct accumulator, and in-place pair rewriting
via ``transform``. The only shuffle per iteration is the pair-count
groupBy on the type table; the winning pair re-enters as a one-row
broadcast, keeping the loop fully declarative (no ``collect`` of data).

Semantics pinned to the reference BPE: pair counts include overlapping
occurrences; merging applies left-to-right non-overlapping (in a run of
identical overlapping matches — only possible when left == right — every
other occurrence merges); the winning pair breaks count ties by
lexicographic (lhs, rhs) so the merge table is deterministic and
cross-engine reproducible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

# match positions of (lhs, rhs) in syms — empty for single-symbol words
_POSITIONS = (
    "IF(size(syms) < 2, cast(array() as array<int>), "
    "filter(sequence(0, size(syms) - 2), i -> syms[i] = lhs AND syms[i + 1] = rhs))"
)

# greedy leftmost non-overlapping selection: keep p unless it overlaps the
# previously kept position (kept positions must differ by >= 2)
_KEPT = (
    f"aggregate({_POSITIONS}, "
    "named_struct('kept', cast(array() as array<int>), 'last', -2), "
    "(acc, p) -> IF(p > acc.last + 1, "
    "named_struct('kept', array_append(acc.kept, p), 'last', p), acc)).kept"
)

# drop the consumed right symbol (i-1 kept), rewrite the left one (i kept)
_REBUILD = (
    "transform("
    "filter(sequence(0, size(syms) - 1), i -> NOT array_contains(kept, i - 1)), "
    "i -> IF(array_contains(kept, i), concat(syms[i], syms[i + 1]), syms[i]))"
)

_PAIRS = (
    "transform(sequence(0, size(syms) - 2), "
    "i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs))"
)


def bpe_merges(
    word_counts: DataFrame,
    num_merges: int,
    word_col: str = "word",
    count_col: str = "n",
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from a (word, count) type table.

    Returns (step, lhs, rhs, merged, pair_count) — one row per learned
    merge, ``step`` starting at 1. If the vocabulary runs out of pairs
    before ``num_merges`` (every word collapsed to one symbol), later steps
    contribute no rows.

    Word types are weighted by their corpus frequency, so the result is
    identical to training on the raw corpus. Each step's winning pair is
    materialized with an eager ``localCheckpoint`` (it is consumed by both
    the merge-table output and the rewrite path, and materializing it keeps
    the word-table lineage a linear chain instead of a 2^k branch tree) —
    one vocabulary-sized sub-second job per merge."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    # One corpus-sized job here, then every iteration is vocab-sized: the
    # initial type table is materialized so no step re-scans the corpus.
    # Empty-string word types are dropped: sequence(1, length('')) is the
    # DESCENDING [1, 0] in Spark, which would split '' into ["", ""] and
    # fabricate a ('','') pair weighted by the type's count.
    words = (
        word_counts.filter(F.length(F.col(word_col)) > 0)
        .select(
            F.expr(
                f"transform(sequence(1, length({word_col})), "
                f"i -> substring({word_col}, i, 1))"
            ).alias("syms"),
            F.col(count_col).cast("long").alias("_n"),
        )
        .localCheckpoint()
    )

    steps: list[DataFrame] = []
    for s in range(1, num_merges + 1):
        top = (
            words.filter(F.size("syms") >= 2)
            .select(F.explode(F.expr(_PAIRS)).alias("pr"), F.col("_n"))
            .groupBy("pr.lhs", "pr.rhs")
            .agg(F.sum("_n").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("lhs"), F.col("rhs"))
            .limit(1)
            .localCheckpoint()
        )
        steps.append(
            top.select(
                F.lit(s).alias("step"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                "pair_count",
            )
        )
        # no checkpoint on the word table: with each step's winning pair
        # materialized, the only live reference to words_{s-1} is words_s,
        # so the lineage is a linear depth-k chain of row-local rebuilds —
        # checkpointing it would only add a per-step job.
        words = (
            words.crossJoin(F.broadcast(top))
            .withColumn("kept", F.expr(_KEPT))
            .select(F.expr(_REBUILD).alias("syms"), "_n")
        )
    return reduce(DataFrame.unionAll, steps)


def _rewrite(syms, lhs, rhs):
    """One merge application as a pure Column expression: the same greedy
    leftmost-non-overlapping select + rewrite as training, with the pair
    supplied as (possibly lambda-bound) columns. Referenced once inside
    the :func:`bpe_encode` fold, so its size never multiplies."""
    positions = F.when(
        F.size(syms) < 2, F.array().cast("array<int>")
    ).otherwise(
        F.filter(
            F.sequence(F.lit(0), F.size(syms) - 2),
            lambda i: (F.get(syms, i) == lhs) & (F.get(syms, i + 1) == rhs),
        )
    )
    init = F.struct(
        F.array().cast("array<int>").alias("kept"), F.lit(-2).alias("last")
    )
    kept = F.aggregate(
        positions,
        init,
        lambda acc, p: F.when(
            p > acc["last"] + 1,
            F.struct(
                F.array_append(acc["kept"], p).alias("kept"), p.alias("last")
            ),
        ).otherwise(acc),
    )["kept"]
    idx = F.filter(
        F.sequence(F.lit(0), F.size(syms) - 1),
        lambda i: ~F.array_contains(kept, i - 1),
    )
    return F.transform(
        idx,
        lambda i: F.when(
            F.array_contains(kept, i), F.concat(F.get(syms, i), F.get(syms, i + 1))
        ).otherwise(F.get(syms, i)),
    )


def collect_merges(merges: DataFrame) -> list[tuple[str, str]]:
    """Collect a trained merge table to an ordered (lhs, rhs) list — the
    tokenizer model artifact (k rows of driver metadata, like a PQ
    codebook), ready to re-enter encode plans as literals."""
    return [(r["lhs"], r["rhs"]) for r in merges.orderBy("step").collect()]


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained BPE merge list: (id, pos, tok_idx,
    token) — ``pos`` is the word position in the document, ``tok_idx`` the
    subword position within the word.

    Applying the merges once each, in training order, with the same greedy
    leftmost-non-overlapping rewrite as training is equivalent to the
    rank-priority loop of classic apply-BPE implementations: a merge
    learned at step s pairs symbols that exist at step s, so no later
    rewrite can create an occurrence of an earlier pair.

    Scale shape: the merge fold runs over the *distinct word types* (one
    vocab-sized aggregation), not per occurrence — each type is encoded
    once, then joins back to the word stream. This is how production
    tokenizers amortize encode cost over Zipf-distributed corpora. The
    merge list enters the plan as a literal array folded with
    ``aggregate``, so the rewrite expression appears ONCE regardless of k
    (unrolling k projections would let CollapseProject inline the rewrite
    into itself — 3^k expression blowup; runtime iteration keeps the plan
    constant-size)."""
    from scala_etl_test_spark.operators.dedup import words as _words

    word_long = df.select(
        F.col(id_col),
        F.posexplode(_words(F.col(text_col))).alias("pos", "word"),
    ).filter(F.col("word") != "")

    chars0 = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    if merges:
        merge_lit = F.array(
            *[
                F.struct(F.lit(l).alias("lhs"), F.lit(r).alias("rhs"))
                for l, r in merges
            ]
        )
        syms = F.aggregate(
            merge_lit, chars0, lambda acc, m: _rewrite(acc, m["lhs"], m["rhs"])
        )
    else:
        # a legitimately empty merge list (single-char training corpus)
        # means character-level tokens; an empty F.array() literal is
        # array<null> and would fail the lambda's field access
        syms = chars0
    types_enc = word_long.select("word").distinct().select(
        "word", syms.alias("syms")
    )

    return (
        word_long.join(types_enc, on="word")
        .select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            F.posexplode("syms").alias("tok_idx", "token"),
        )
        .select(
            id_col, "pos", F.col("tok_idx").cast("long").alias("tok_idx"), "token"
        )
    )
