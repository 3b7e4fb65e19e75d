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
