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

from scala_etl_test_spark.caching import tracked_persist

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


def token_budget_allocation(
    df: DataFrame,
    group_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Apportion a global training-token ``budget`` across sources in
    proportion to their token mass, by the largest-remainder method
    (Hamilton apportionment): every group gets
    ``floor(group_tokens * budget / total)``, and the leftover tokens go
    one each to the largest remainders (ties → group asc). Allocations
    sum exactly to ``budget`` and the whole computation is int64 — the
    remainder comparison uses ``(group_tokens * budget) mod total``
    directly, so there is no float apportionment drift anywhere.

    Scale shape: one map-side-combined aggregate to (group, tokens); the
    apportionment itself runs on the group table (bounded: #sources, not
    #docs), where the single-partition window is fine.

    Returns (group, group_tokens, alloc_tokens)."""
    if budget < 0:
        raise ValueError("budget must be >= 0")
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    # tokens×budget in DECIMAL(38,0): the int64 product wraps at corpus
    # scale (1e10 tokens × 1e9 budget), silently corrupting every
    # allocation. DIV on decimals is exact integral division and the
    # quotient itself always fits a long (base ≤ budget).
    g = (
        df.groupBy(F.col(group_col))
        .agg(F.sum(F.col(token_col)).cast("long").alias("group_tokens"))
        .withColumn(
            "_num", F.col("group_tokens").cast("decimal(38,0)") * F.lit(budget)
        )
        .withColumn("_total", F.sum("group_tokens").over(w_all))
        .withColumn("_base", F.expr("CAST(_num DIV _total AS LONG)"))
        .withColumn(
            "_rem",
            F.col("_num") - F.col("_base").cast("decimal(38,0)") * F.col("_total"),
        )
    )
    ranked = g.withColumn(
        "_rn",
        F.row_number().over(w_all.orderBy(F.col("_rem").desc(), F.col(group_col))),
    ).withColumn("_leftover", F.lit(budget) - F.sum("_base").over(w_all))
    return ranked.select(
        group_col,
        "group_tokens",
        (F.col("_base") + F.when(F.col("_rn") <= F.col("_leftover"), 1).otherwise(0))
        .cast("long")
        .alias("alloc_tokens"),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    split_col: str = "split",
    components: DataFrame | None = None,
) -> DataFrame:
    """Split where every near-duplicate cluster lands in ONE split: hash the
    cluster representative (connected-components min id), not the row id —
    otherwise a train/test near-dup pair leaks test content into training.

    Pass ``components`` (a (node, component) map) when the caller already
    ran :func:`cluster.connected_components` on the same pairs — the CC
    iteration is the most expensive stage here and must not run twice."""
    if components is None:
        from scala_etl_test_spark.operators.cluster import connected_components

        components = connected_components(pairs)
    comp = components.withColumnRenamed("node", id_col)
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


def _hashed_gram_buckets(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram occurrence, hashed
    into ``n_buckets`` via the portable md5-prefix trick. The hashed-
    feature representation of DSIR (Xie et al. 2023): collisions are part
    of the estimator, not an error."""
    from scala_etl_test_spark.operators.dedup import shingles_from_words, words

    # materialize the filtered words array as a named column BEFORE the
    # shingle lambda touches it (see shingles_from_words perf note: lambda
    # bodies get no CSE, so an inline expression would re-split per element)
    base = df.select(
        F.col(id_col), F.filter(words(text_col), lambda x: x != "").alias("_w")
    )
    grams = F.concat(
        F.col("_w"),
        F.when(F.size("_w") >= 2, shingles_from_words(F.col("_w"), 2)).otherwise(
            F.array().cast("array<string>")
        ),
    )
    return (
        base.select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(F.col(id_col), hash_bucket(F.col("_g"), n_buckets).alias("bucket"))
    )


def dsir_importance_weights(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every source
    document by how target-like its hashed n-gram (unigram+bigram) profile
    is — ``log_weight = Σ_features log(p_target(b) / p_source(b))`` with
    add-1 smoothing over the ``n_buckets`` hashed buckets. Feed the
    (exponentiated, scaled) weight into :func:`weighted_sample` for the
    resampling step; both halves stay deterministic and engine-portable.

    Returns (id, n_feats, log_weight) for every source document with at
    least one feature (empty/whitespace-only documents have no profile and
    emit no row).

    Scale shape: the corpus is scanned once into a narrow (id, bucket)
    explode; both bucket-probability tables are ``n_buckets``-bounded
    aggregates (map-side partial combine, then a broadcast back onto the
    feature stream) — so the only corpus-sized shuffle is the final per-id
    aggregation. The target corpus is typically a small exemplar set; its
    scan is a side input, never joined row-to-row against the source.

    Cache lifecycle: the source feature explode stays persisted for the
    returned frame's lifetime — the CALLER owns the cache (unpersist via
    ``spark.catalog.clearCache()`` or keep a handle), same contract as
    :func:`bigram_lm_scores`.
    """
    src_f = _hashed_gram_buckets(source, text_col, id_col, n_buckets).transform(tracked_persist)
    tgt_f = _hashed_gram_buckets(target, text_col, id_col, n_buckets)
    sc = src_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_s"))
    tc = tgt_f.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    totals_s = src_f.agg(F.count(F.lit(1)).alias("t_s"))
    totals_t = tgt_f.agg(F.count(F.lit(1)).alias("t_t"))
    # every bucket a source doc references has c_s >= 1 (its own grams are
    # in the source counts), so only the target side needs the 0-fallback
    ratio = (
        sc.join(tc, on="bucket", how="left")
        .crossJoin(F.broadcast(totals_s))
        .crossJoin(F.broadcast(totals_t))
        .select(
            "bucket",
            (
                F.log((F.coalesce("c_t", F.lit(0)) + 1) / (F.col("t_t") + n_buckets))
                - F.log((F.col("c_s") + 1) / (F.col("t_s") + n_buckets))
            ).alias("_lr"),
        )
    )
    return (
        src_f.join(F.broadcast(ratio), on="bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.round(F.sum("_lr"), round_digits).alias("log_weight"),
        )
    )


def shard_by_hash(df: DataFrame, key_col: str, n_shards: int, shard_col: str = "shard_id") -> DataFrame:
    """Content-addressed export sharding: ``shard = md5(key) mod n_shards``.
    The manifest primitive for corpus export — a doc's shard is a pure
    function of its key, so shards are reproducible across engines and
    reruns, stable under corpus growth (a doc never migrates), and
    balanced in expectation. Row-local projection, zero shuffles; pair
    with ``write.partitionBy(shard_col)`` for the physical layout.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    return df.withColumn(shard_col, hash_bucket(F.col(key_col), n_shards))
