"""Record linkage / entity resolution: blocked candidate generation plus
Fellegi–Sunter log-likelihood scoring.

The canonical data-integration operator (Fellegi & Sunter 1969): when two
tables describe the same real-world entities but share NO reliable key,
candidate pairs are generated inside cheap blocks (never the cross
product), each pair gets a vector of per-field agreement indicators, and
the pair's score is the sum of per-field log-likelihood weights —
``log2(m/u)`` when the field agrees (m = P(agree | same entity),
u = P(agree | different entities)), ``log2((1−m)/(1−u))`` when it
disagrees. Two thresholds split the score range into match / possible
(clerical review) / non-match, the classic three-way decision.

Weights here are CALLER-DECLARED constants (the textbook setup with
externally supplied m/u estimates); EM-fitting them from the candidate set
is a documented extension, not implemented — the scoring plan is identical
either way, only the constants' provenance changes.

Scale shape: one shuffle on the blocking key for the candidate join
(blocking keys are chosen low-skew by construction — a hot block degrades
to blocked n² and needs a finer key, the same argument as the LSH bucket
cap in operators/dedup.py); the agreement vector and score are row-local
projections; the decision is a constant-fold `when` chain. Nothing about
the pattern changes at 100 TB except the blocking key's granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# A field comparator: (field_name, agreement_predicate, w_agree, w_disagree).
FieldSpec = tuple[str, Column, float, float]


def blocked_pairs(
    left: DataFrame,
    right: DataFrame,
    block_cols: Sequence[str],
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Candidate pairs via an equi-join on the blocking key(s).

    Every non-blocking column is prefixed so the two sides stay
    distinguishable in downstream comparators; blocking columns keep their
    names (they are equal by construction). Recall contract: a true match
    whose blocking fields were themselves miscaptured is invisible — run
    multiple passes with different blocking keys and union, the standard
    multi-pass blocking remedy.
    """
    lp = left.select(
        *[F.col(c) for c in block_cols],
        *[
            F.col(c).alias(f"{left_prefix}{c}")
            for c in left.columns
            if c not in block_cols
        ],
    )
    rp = right.select(
        *[F.col(c) for c in block_cols],
        *[
            F.col(c).alias(f"{right_prefix}{c}")
            for c in right.columns
            if c not in block_cols
        ],
    )
    return lp.join(rp, on=list(block_cols))


def fellegi_sunter_score(
    pairs: DataFrame,
    fields: Sequence[FieldSpec],
    upper: float,
    lower: float,
    round_digits: int = 6,
) -> DataFrame:
    """Score blocked pairs and take the three-way FS decision.

    Adds one boolean ``agree_<field>`` per comparator, ``score`` = the sum
    of that field's agree/disagree weight in DECLARED field order (a fixed
    small double sum — deterministic cross-engine), and ``decision``:
    score ≥ upper → 'match', ≥ lower → 'possible', else 'non_match'.
    A NULL in a comparator's inputs makes the predicate NULL → treated as
    DISAGREEMENT (F.coalesce to false), the conservative FS convention.
    """
    out = pairs
    score: Column = F.lit(0.0)
    for name, pred, w_agree, w_disagree in fields:
        flag = F.coalesce(pred, F.lit(False))
        out = out.withColumn(f"agree_{name}", flag)
        score = score + F.when(F.col(f"agree_{name}"), F.lit(w_agree)).otherwise(
            F.lit(w_disagree)
        )
    out = out.withColumn("score", F.round(score, round_digits))
    return out.withColumn(
        "decision",
        F.when(F.col("score") >= upper, F.lit("match"))
        .when(F.col("score") >= lower, F.lit("possible"))
        .otherwise(F.lit("non_match")),
    )
