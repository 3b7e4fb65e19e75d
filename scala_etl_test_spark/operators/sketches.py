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
