"""Distribution-drift monitoring: Population Stability Index per group.

PSI is the standard training-data drift metric: bin a metric column,
compare the bin shares of a baseline population ``p`` against a current
population ``q``, and sum ``(p_i − q_i)·ln(p_i/q_i)`` — 0 for identical
distributions, conventionally >0.1 "some drift", >0.25 "major drift".
Here the two populations are the early and late halves of the event
stream (split at the midpoint of the observed time range), so the query
answers "did this metric's distribution move over the window?" per
event type — the check a 100 TB ingest pipeline runs before letting a new
snapshot into a training mix.

Determinism contract (cross-engine hashable): bin edges derive from the
global min/max by the same double arithmetic in both engines; bin shares
use additive smoothing ``(n_i + 0.5) / (N + bins/2)`` so empty bins never
hit ``ln(0)``; the PSI is rounded. Scale shape: one bounds aggregate
(broadcast 1 row), then one scan into a (group, bin, half) count — narrow
uniform keys, map-side combine — and a bounded (groups × bins) reshape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scala_etl_test_spark.caching import tracked_persist

N_BINS = 10


def psi_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    time_col: str,
    n_bins: int = N_BINS,
    threshold: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """Per-``group_col`` PSI of ``value_col`` between the early and late
    halves of ``time_col``'s observed range.

    Rows with a NULL value or NULL timestamp are EXCLUDED (a NULL metric
    has no bin and a NULL time has no half; counting them anywhere would
    silently distort the shares). The PSI sums over ALL ``n_bins`` bins —
    a bin empty in both halves still contributes its smoothed term
    whenever the half sizes differ, exactly as the share formula above
    states. A constant metric (vmax == vmin) degenerates to every row in
    bin 0 and PSI 0 rather than a division by zero.

    Returns (group, n_early, n_late, psi, drifted) — ``psi`` rounded for
    cross-engine hash stability, ``drifted`` = psi > threshold."""
    df = df.filter(F.col(value_col).isNotNull() & F.col(time_col).isNotNull())
    t_us = F.unix_micros(F.col(time_col))
    bounds = df.agg(
        F.min(value_col).alias("_vmin"),
        F.max(value_col).alias("_vmax"),
        F.min(t_us).alias("_tmin"),
        F.max(t_us).alias("_tmax"),
    )
    b = df.join(F.broadcast(bounds))
    width = (F.col("_vmax") - F.col("_vmin")) / n_bins
    raw_bin = F.floor((F.col(value_col) - F.col("_vmin")) / width)
    # integer-microsecond midpoint: the early/late split is exact int64
    # arithmetic, no interval/float timestamp math to drift across engines.
    # The when() guard keeps the division out of the constant-metric branch
    # (lazy branch evaluation), not just its result.
    binned = b.select(
        F.col(group_col),
        F.when(F.col("_vmax") == F.col("_vmin"), F.lit(0))
        .otherwise(F.least(F.lit(n_bins - 1), raw_bin))
        .cast("int")
        .alias("bin"),
        (t_us * 2 < F.col("_tmin") + F.col("_tmax")).alias("early"),
    )
    counts = binned.groupBy(group_col, "bin").agg(
        F.sum(F.when(F.col("early"), 1).otherwise(0)).alias("n_early_bin"),
        F.sum(F.when(F.col("early"), 0).otherwise(1)).alias("n_late_bin"),
    )
    totals = counts.groupBy(group_col).agg(
        F.sum("n_early_bin").alias("n_early"), F.sum("n_late_bin").alias("n_late")
    )
    # full (group × bin) grid: bins unoccupied in BOTH halves still carry
    # a smoothed term when n_early != n_late — dropping them biases PSI low
    grid = totals.crossJoin(
        df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    )
    j = grid.join(counts, on=[group_col, "bin"], how="left").fillna(
        0, subset=["n_early_bin", "n_late_bin"]
    )
    p = (F.col("n_early_bin") + 0.5) / (F.col("n_early") + n_bins * 0.5)
    q = (F.col("n_late_bin") + 0.5) / (F.col("n_late") + n_bins * 0.5)
    term = (p - q) * F.log(p / q)
    return (
        j.groupBy(group_col)
        .agg(
            F.max("n_early").alias("n_early"),
            F.max("n_late").alias("n_late"),
            F.round(F.sum(term), round_digits).alias("psi"),
        )
        .select(
            group_col,
            "n_early",
            "n_late",
            "psi",
            (F.col("psi") > threshold).alias("drifted"),
        )
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str,
    group_col: str,
    alpha: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group unigram KL divergence KL(P_group ‖ P_corpus) in bits —
    the vocabulary-drift twin of :func:`psi_drift` (which watches a
    NUMERIC metric; this watches the word distribution itself). The
    question it answers on a training mix: "how far does each source's
    language deviate from the blend?" — the signal behind DoReMi-style
    reweighting and new-source admission checks.

    Model: q(w) = corpus MLE (every vocab word has count ≥ 1, no
    smoothing needed); p_g(w) = (c_g(w) + α) / (n_g + α|V|), additive
    smoothing over the CORPUS vocab so KL is finite for words the group
    never uses.

    Scale shape — the naive Σ over (group × vocab) is a grid join that
    explodes exactly when vocab is large; instead the absent-word mass is
    folded into two corpus-level scalars. With p0 = α/(n_g + α|V|) (the
    smoothed probability of any ABSENT word):

        KL_g = Σ_present [p_g·log2(p_g/q) − p0·log2(p0/q)]
             + |V|·p0·log2(p0) − p0·S,  where S = Σ_vocab log2 q(w)

    so per-group work is proportional to the words the group actually
    contains, and (|V|, S) ride along as one broadcast row. Algebra:
    Σ_absent p0·log2(p0/q) = Σ_vocab p0·log2(p0/q) − Σ_present p0·log2(p0/q),
    and the vocab-wide sum collapses to |V|·p0·log2(p0) − p0·S.

    Returns (group, n_tokens, n_distinct_words, kl_bits) — kl_bits
    rounded; double-sum order differs across engines but the rounding
    sits far above the accumulated ~1e-13 error."""
    from scala_etl_test_spark.operators.dedup import words

    tok = df.select(
        F.col(group_col).alias("grp"), F.explode(words(text_col)).alias("word")
    ).filter(F.col("word") != "")
    tok = tok.transform(tracked_persist)
    # corpus model: q(w), plus the two scalars the absent-mass fold needs
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    corpus = freq.agg(
        F.sum("c").alias("n_corpus"), F.count(F.lit(1)).alias("v_size")
    )
    q_tbl = freq.crossJoin(F.broadcast(corpus)).select(
        "word", (F.col("c") / F.col("n_corpus")).alias("q")
    )
    scalars = q_tbl.agg(
        F.count(F.lit(1)).alias("v_size"),
        F.sum(F.log2("q")).alias("sum_log2_q"),
    )
    # per-(group, word) counts joined to q — rows only for PRESENT words
    gw = tok.groupBy("grp", "word").agg(F.count(F.lit(1)).alias("c_g"))
    g_tot = gw.groupBy("grp").agg(
        F.sum("c_g").alias("n_g"), F.count(F.lit(1)).alias("n_distinct")
    )
    j = (
        gw.join(q_tbl, on="word")
        .join(F.broadcast(g_tot), on="grp")
        .join(F.broadcast(scalars))
    )
    p0 = F.lit(alpha) / (F.col("n_g") + F.lit(alpha) * F.col("v_size"))
    p_g = (F.col("c_g") + F.lit(alpha)) / (F.col("n_g") + F.lit(alpha) * F.col("v_size"))
    present_term = p_g * F.log2(p_g / F.col("q")) - p0 * F.log2(p0 / F.col("q"))
    per_group = j.groupBy("grp").agg(
        F.max("n_g").alias("n_tokens"),
        F.max("n_distinct").alias("n_distinct_words"),
        F.sum(present_term).alias("present_sum"),
    )
    out = per_group.join(F.broadcast(scalars))
    p0o = F.lit(alpha) / (F.col("n_tokens") + F.lit(alpha) * F.col("v_size"))
    kl = (
        F.col("present_sum")
        + F.col("v_size") * p0o * F.log2(p0o)
        - p0o * F.col("sum_log2_q")
    )
    return out.select(
        F.col("grp").alias(group_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct_words").cast("long").alias("n_distinct_words"),
        F.round(kl, round_digits).alias("kl_bits"),
    )


def ks_two_sample(
    tagged: DataFrame,
    group_col: str,
    value_col: str,
    flag_col: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov D per group, between the rows
    where ``flag_col`` is true (sample 1) and false (sample 2) — the
    distribution-free drift statistic (PSI needs bins, Welch assumes the
    mean is what moved; KS bounds the max CDF gap with no parameters).

    Exactness under ties: both ECDFs are evaluated with a RANGE window
    frame — every row equal to the current value sits inside the frame,
    which IS the right-continuous ECDF at each pooled jump point. A ROWS
    frame would split ties arbitrarily and overstate D.

    Plan: ONE shuffle (the per-group value window); the per-group totals
    ride the same window partition, and the final max reuses that
    partitioning. One group's values order through one task at gate scale
    — the standard two-pass parallel prefix replaces it at stream scale.

    Returns (group, n_true, n_false, ks_stat, ks_crit_05, drifted) with
    the 5%-level decision in-band: D > 1.358·√((n1+n2)/(n1·n2)).
    """
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    flag = lambda b: F.when(F.col(flag_col) == b, 1).otherwise(0)  # noqa: E731
    stepped = tagged.select(
        F.col(group_col),
        F.sum(flag(True)).over(w_cum).alias("_c1"),
        F.sum(flag(False)).over(w_cum).alias("_c2"),
        F.sum(flag(True)).over(w_all).alias("_n1"),
        F.sum(flag(False)).over(w_all).alias("_n2"),
    )
    # guard the ECDF divisions: a group with ZERO rows in one sample (a
    # type that only exists in one half — the 'new type appeared' drift
    # case) would divide by zero under ANSI mode. Such a group is maximal
    # drift BY DEFINITION: ks_stat = 1.0, drifted = true, crit = NULL
    # (the critical value is undefined at n = 0).
    gap = F.when(
        (F.col("_n1") > 0) & (F.col("_n2") > 0),
        F.abs(
            F.col("_c1").cast("double") / F.col("_n1").cast("double")
            - F.col("_c2").cast("double") / F.col("_n2").cast("double")
        ),
    )
    g = stepped.groupBy(group_col).agg(
        F.max("_n1").cast("long").alias("n_true"),
        F.max("_n2").cast("long").alias("n_false"),
        F.max(gap).alias("_d"),
    )
    both = (F.col("n_true") > 0) & (F.col("n_false") > 0)
    crit = F.when(
        both,
        F.lit(1.358)
        * F.sqrt(
            (F.col("n_true") + F.col("n_false")).cast("double")
            / (F.col("n_true") * F.col("n_false")).cast("double")
        ),
    )
    return g.select(
        group_col,
        "n_true",
        "n_false",
        F.round(F.when(both, F.col("_d")).otherwise(F.lit(1.0)), 6).alias("ks_stat"),
        F.round(crit, 6).alias("ks_crit_05"),
        F.when(both, F.col("_d") > crit).otherwise(F.lit(True)).alias("drifted"),
    )
