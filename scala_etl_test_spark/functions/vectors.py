"""Vector math over ``array<float/double>`` columns as native expressions.

Built on ``F.zip_with`` / ``F.aggregate`` (higher-order functions) — JVM-side
per-element loops, no Python in the path, no UDF serialization. Used by the
similarity-search and embedding-dedup operators.

The fold order is the array's element order (sequential), so results are
bit-reproducible across runs and engines that fold sequentially.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length arrays."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            _c(a),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na != 0) & (nb != 0), dot(a, b) / (na * nb))
