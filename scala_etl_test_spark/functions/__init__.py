"""Column-function library (native expressions only)."""

from scala_etl_test_spark.functions.cleaning import (
    strip_non_ascii,
    fix_hour_24,
    int_div,
)
from scala_etl_test_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "strip_non_ascii",
    "fix_hour_24",
    "int_div",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
