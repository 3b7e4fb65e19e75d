"""Range (interval-containment) join — beyond-reference.

Joining points to intervals (``start <= point_ts <= end``) with a raw range
predicate gives Spark a broadcast-nested-loop or cartesian plan: |P|·|I|
comparisons per key group — the classic 100 TB killer. This is the
**bin-blocked** form:

    points   → bin = floor(ts / bin_width)                (one bin each)
    intervals → explode over every bin the interval spans  (≈ len/width bins)
    equi-join on (partition_cols…, bin) → exact containment filter

The equi-join hash-partitions on the bin, so the work is proportional to
points + interval-coverage, never to the cross product. A (point, interval)
pair can only meet in the point's single bin ⇒ no duplicate matches, no
distinct needed.

Choosing ``bin_width_seconds``: ≈ the typical interval length. Too small →
interval explode fans out; too large → many non-matching candidates per bin.
Both failure modes degrade gracefully (correctness never depends on it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bin(col, width_us: int):
    return (F.unix_micros(col) / F.lit(width_us)).cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    partition_cols: list[str] | None = None,
    bin_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``points`` × matching rows of ``intervals`` with
    ``start_ts <= point_ts <= end_ts`` (and equality on ``partition_cols``).

    ``how='inner'`` drops unmatched points; ``'left'`` keeps them with NULL
    interval columns (implemented as inner + anti-union so the blocked path
    is identical)."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    keys = partition_cols or []
    width_us = bin_width_seconds * 1_000_000

    p = points.withColumn("_bin", _bin(F.col(point_ts), width_us))
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(_bin(F.col(start_ts), width_us), _bin(F.col(end_ts), width_us))
        ),
    )
    matched = (
        p.join(iv, on=keys + ["_bin"], how="inner")
        .filter((F.col(start_ts) <= F.col(point_ts)) & (F.col(point_ts) <= F.col(end_ts)))
        .drop("_bin")
    )
    if how == "inner":
        return matched
    unmatched = p.drop("_bin").join(
        matched.select(*points.columns), on=points.columns, how="left_anti"
    )
    for c in intervals.columns:
        if c not in points.columns:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched)
