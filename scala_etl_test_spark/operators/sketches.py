"""Count-Min-Sketch heavy hitters — the frequency member of the bounded-
sketch family (HLL++ distinct counts in ``plans/queries.py:
q_approx_distinct_users``, GK quantiles in ``q_approx_quantiles_events``).

CMS (Cormode & Muthukrishnan 2005) answers "how often does key x occur"
from a fixed ``d×w`` counter grid (``d = ⌈ln 1/δ⌉`` rows, ``w = ⌈e/ε⌉``
columns): one pass, mergeable across partitions (Spark's
``df.stat.countMinSketch`` merges per-partition sketches exactly like any
map-side-combined aggregate), memory independent of cardinality. The
estimate never undercounts, and overshoots by at most ``ε·N`` with
probability ``1−δ`` — both sides of that guarantee are checked in-band
here, the same verification pattern as the HLL gate query.

Scale shape: at 100 TB you keep only the sketch pass (fixed memory per
executor, one reduce of ``d×w`` longs). The exact-count half of this
operator is the verification harness, restricted to the top-n candidates,
sized for the gate's sf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def cms_sketch_agg(col: str, eps: float, confidence: float, seed: int):
    """The ``count_min_sketch`` aggregate expression — ONE definition shared
    by the batch operator and the streaming absorber so their grids stay
    mergeable (same eps/confidence/seed handling by construction)."""
    return F.expr(
        f"count_min_sketch({col}, cast({eps} as double), "
        f"cast({confidence} as double), {seed})"
    )


def read_cms(spark, blob: bytes):
    """Deserialize a CMS binary back to the JVM sketch object."""
    jvm = spark._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(blob))
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    top_n: int = 10,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Top-``top_n`` keys by exact count, each annotated with whether the
    CMS estimate respects both CMS guarantees:
    ``exact ≤ estimate ≤ exact + ε·N``.

    Returns (key, exact_count, within_bound) ordered by (count desc, key).
    The sketch is a driver-side model artifact (``d×w`` longs); the
    ``top_n`` point queries against it are bounded driver work, not a data
    collect. The column must be integral (the point query boxes keys as
    long, matching how the aggregate hashed them); NULL keys are excluded
    — a NULL has no CMS item to query."""
    dtype = df.schema[col].dataType
    if not isinstance(dtype, _INTEGRAL):
        raise ValueError(
            f"cms_heavy_hitters needs an integral key column; {col} is {dtype}"
        )
    df = df.filter(F.col(col).isNotNull())
    spark = df.sparkSession
    # one aggregate yields the sketch AND the total row count (the ε bound
    # is relative to N); the binary is the standard mergeable CMS the SQL
    # aggregate built map-side per partition
    agg = df.agg(
        cms_sketch_agg(col, eps, confidence, seed).alias("_sketch"),
        F.count(F.lit(1)).alias("_n"),
    ).first()
    total = agg["_n"]
    jvm = spark._jvm
    sketch = read_cms(spark, agg["_sketch"])
    exact_top = (
        df.groupBy(F.col(col).alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("key"))
        .limit(top_n)
    )
    slack = int(eps * total) + 1
    out = []
    for r in exact_top.collect():
        # box explicitly as java.lang.Long: the SQL aggregate hashed the
        # column as longs, and a py4j-auto-boxed Integer would hash as a
        # different item type
        est = sketch.estimateCount(jvm.java.lang.Long(int(r["key"])))
        ok = r["exact_count"] <= est <= r["exact_count"] + slack
        out.append((int(r["key"]), int(r["exact_count"]), bool(ok)))
    return spark.createDataFrame(
        out, "key long, exact_count long, within_bound boolean"
    )


def histogram_quantile_merge(
    df: DataFrame,
    value_col: str,
    day_col,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    nbins: int = 64,
) -> DataFrame:
    """Mergeable-quantile workflow — the quantile member of the bounded-
    sketch family (HLL distinct / theta set-algebra / CMS frequency / GK
    rank). Each day contributes a fixed equi-width histogram PARTIAL
    (``nbins`` longs, bins cut from the global min/max); the period sketch
    is the bin-wise SUM of partials — the merge is exact, associative, and
    commutative, which is the whole point: day files union to week/month
    totals without touching raw values again.

    Per requested quantile q the sketch answers with the rank-q estimate
    interpolated inside its bin; the histogram guarantee — the type-1
    (rank-statistic) quantile lives in the SAME bin, so
    ``|est − exact| ≤ bin_width`` — is checked IN-BAND (same pattern as
    the HLL/CMS gates): the exact rank statistic flips ``within_bound``
    on any violation. Degenerate range (min == max) collapses every
    estimate to that value.

    Returns (quantile, n, est_value, exact_value, bin_width, within_bound).

    Scale shape: the sketch path is one scan into (day, bin) counts —
    map-side combined, ≤ days·nbins rows — then a ≤ nbins-row merge and
    driver-scale quantile solving on a broadcast of the cumulative bins.
    The exact column is the AUDIT half (a global rank selection — one
    total-order sort), sized for the gate sf; at 100 TB you ship only the
    sketch path and drop the audit columns.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    day = day_col if not isinstance(day_col, str) else F.col(day_col)
    v = F.col(value_col).cast("double")
    ev = df.filter(v.isNotNull()).select(day.alias("_day"), v.alias("_v"))
    bounds = ev.agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(nbins))
    bin_of = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("_v") - F.col("_lo")) / width).cast("int"),
            F.lit(nbins - 1),
        )
    )
    # the mergeable daily partials (what a real pipeline persists per day)…
    partials = (
        ev.join(F.broadcast(bounds))
        .select("_day", bin_of.alias("_bin"))
        .groupBy("_day", "_bin")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # …and their union to the period sketch: bin-wise SUM, nothing else
    merged = partials.groupBy("_bin").agg(F.sum("_c").alias("_c"))
    w_cum = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "_bin", "_c", F.sum("_c").over(w_cum).alias("_cum")
    )
    qs = spark.createDataFrame([(float(q),) for q in quantiles], "quantile double")
    # rank target: the type-1 quantile is the ceil(q·n)-th smallest value
    target = F.ceil(F.col("quantile") * F.col("_n")).cast("long")
    picked = (
        qs.join(F.broadcast(bounds))
        .join(
            F.broadcast(cum),
            on=(F.col("_cum") >= target) & ((F.col("_cum") - F.col("_c")) < target),
        )
    )
    est = F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
        F.col("_lo")
        + width * F.col("_bin").cast("double")
        + width
        * (
            (target - (F.col("_cum") - F.col("_c"))).cast("double")
            / F.col("_c").cast("double")
        )
    )
    # audit half: the exact rank statistic via one global sort
    w_rank = Window.orderBy("_v")
    ranked = ev.select("_v", F.row_number().over(w_rank).alias("_rn"))
    exact = (
        qs.join(F.broadcast(bounds))
        .select("quantile", target.alias("_rn"))
        .join(ranked, on="_rn")
        .select("quantile", F.col("_v").alias("_exact"))
    )
    bw = F.when(F.col("_hi") == F.col("_lo"), F.lit(0.0)).otherwise(width)
    return (
        picked.select("quantile", F.col("_n").alias("n"), est.alias("_est"), bw.alias("_bw"))
        .join(exact, on="quantile")
        .select(
            "quantile",
            F.col("n").cast("long").alias("n"),
            F.round("_est", 6).alias("est_value"),
            F.round("_exact", 6).alias("exact_value"),
            F.round("_bw", 6).alias("bin_width"),
            (F.abs(F.col("_est") - F.col("_exact")) <= F.col("_bw") + F.lit(1e-9)).alias("within_bound"),
        )
    )
