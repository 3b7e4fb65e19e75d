"""Deterministic dataset splitting & sampling (beyond-reference).

Training pipelines need splits that are (a) reproducible across runs,
engines, and cluster sizes, (b) stable under data growth (a doc keeps its
split when new docs arrive), and (c) leakage-aware (all members of a
duplicate cluster land in the same split). ``randomSplit``/``sample`` give
none of these — they depend on partitioning and seed plumbing.

The primitive here is **hash-bucket assignment**: bucket = md5(key) mod N.
Content-addressed, so it satisfies (a) and (b) by construction, and (c) by
hashing the *cluster representative* instead of the row id. md5 keeps the
assignment portable across engines (same trick as operators/dedup.py) —
swap xxhash64 at production scale, structure unchanged.

No shuffle at all: assignment is a narrow projection; only the optional
per-stratum proportion *checks* aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

HASH_BUCKETS = 10_000


def hash_bucket(col: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic uniform bucket in [0, buckets): md5 → 60-bit int → mod.
    Engine-portable (DuckDB: same md5/substr/mod pipeline)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    return (h % buckets).alias("bucket")


def assign_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/…) by hash bucket.

    ``weights`` maps split name → fraction (must sum to ~1); boundaries are
    cumulative over the insertion order. ``salt`` derives an independent
    split from the same keys (e.g. per-experiment resplits)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    key = F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")) if salt else F.col(key_col)
    b = hash_bucket(key)
    expr = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        bound = int(round(cum * HASH_BUCKETS))
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def stratified_sample_fixed(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows inside each stratum by
    the content hash of their id and keep the first ``k``. Same guarantees
    as ``hash_bucket`` splits — reproducible across engines, runs, and
    cluster sizes (``df.sample``/``sampleBy`` are neither), and a row keeps
    its membership as other strata grow. ``salt`` derives independent
    samples from the same keys.

    Scale: one shuffle on the stratum key; the ranking is a window top-k,
    which Spark executes with per-partition WindowGroupLimit heaps — no
    stratum ever materializes fully on one task."""
    from pyspark.sql import Window

    key = (
        F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
        if salt
        else F.col(id_col).cast("string")
    )
    win = Window.partitionBy(stratum_col).orderBy(F.md5(key).asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mixture_weights(df: DataFrame, group_col: str, round_digits: int = 9) -> DataFrame:
    """Square-root temperature mixing weights per source: weight ∝ √n.
    The multinomial temperature-sampling scheme (alpha = 0.5) used to
    rebalance multi-source/multilingual training mixes — upweights small
    sources relative to their raw share. Returns (group, n_docs, weight).

    Determinism notes: ``sqrt`` is IEEE-correctly-rounded in every engine
    (unlike ``pow(x, 0.5)``), and the weight is rounded to ``round_digits``
    because the denominator is a sum of doubles whose addition order is
    engine- and partitioning-dependent at the last ULP. The group counts are
    a single map-side-combined aggregate; the denominator is a 1-row
    broadcast."""
    g = df.groupBy(F.col(group_col)).agg(F.count(F.lit(1)).alias("n_docs"))
    t = g.agg(F.sum(F.sqrt(F.col("n_docs"))).alias("_denom"))
    return g.join(F.broadcast(t)).select(
        group_col,
        "n_docs",
        F.round(F.sqrt(F.col("n_docs")) / F.col("_denom"), round_digits).alias("weight"),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Split where every near-duplicate cluster lands in ONE split: hash the
    cluster representative (connected-components min id), not the row id —
    otherwise a train/test near-dup pair leaks test content into training."""
    from scala_etl_test_spark.operators.cluster import connected_components

    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    with_rep = df.join(comp, on=id_col, how="left").withColumn(
        "_split_key", F.coalesce("component", F.col(id_col))
    )
    return assign_split(with_rep, "_split_key", weights, split_col).drop(
        "component", "_split_key"
    )


def weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    key_col: Column | str,
    scale: float = 1.0,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep a row iff
    ``u(key) < clamp(scale * weight, 0, 1)`` with ``u`` the
    content-addressed uniform from :func:`hash_bucket` (md5-based, so the
    SAME rows survive on any cluster size, partitioning, engine, or rerun —
    the property ``df.sample()`` cannot give). The workhorse of
    quality-weighted corpus downsampling: weight = quality score ⇒ high-
    quality documents are kept at proportionally higher rates while the
    decision stays a pure function of the row key.

    Row-local filter: zero shuffles, pushed into the scan's projection
    stage; expected kept fraction is E[clamp(scale*w,0,1)] over the corpus.
    ``resolution`` bounds the acceptance-probability granularity (1e-6
    default — weights are compared against the md5 unit at that step)."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = hash_bucket(key_col, resolution) / F.lit(float(resolution))
    p = F.least(F.greatest(w * F.lit(scale), F.lit(0.0)), F.lit(1.0))
    return df.filter(u < p)
