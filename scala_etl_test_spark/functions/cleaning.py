"""Scalar cleaning functions (SURVEY §2.7), as reusable Column builders."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_non_ascii(col: Column | str) -> Column:
    """Remove every non-ASCII character (ApplaudoETL.scala:164). The
    byte-range class ``[^\\x00-\\x7F]`` matches code points > 127, which is
    exactly the reference's behavior on unicode strings."""
    return F.regexp_replace(_c(col), r"[^\x00-\x7F]", "")


def fix_hour_24(col: Column | str) -> Column:
    """``hour == 24 → 0`` (ApplaudoETL.scala:166-167)."""
    c = _c(col)
    return F.when(c == 24, 0).otherwise(c)


def int_div(a: Column | str, b: Column | str) -> Column:
    """Integer division with Spark SQL ``DIV`` semantics: truncation toward
    zero (same as Scala ``Int / Int``), NULL when the divisor is 0 — the
    Trap-1-faithful ratio operator (SURVEY §2.8).

    ``a - a % b`` is an exact multiple of ``b`` (Spark ``%`` follows the
    dividend's sign, like Java), so the final divide is exact and the cast
    back to long loses nothing for |values| < 2^53.
    """
    ca, cb = _c(a).cast("long"), _c(b).cast("long")
    return F.when(cb != 0, ((ca - (ca % cb)) / cb).cast("long"))


def zorder_key(cols: list, bits: int = 16):
    """Z-order (Morton) interleaving of pre-scaled non-negative ints — a
    multi-column clustering key for ``write_compacted(sort_by=[...])``:
    sorting by the interleaved key keeps rows close in EVERY dimension
    close on disk, so parquet row-group min/max stats prune scans filtered
    on any of the dimensions (single-column sort only prunes its own).

    Inputs must already be in [0, 2**bits); scale with
    ``F.floor((c - min) / span * (2**bits - 1))`` from a stats pass.
    Pure shift/mask arithmetic — portable to any engine.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            col = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(2 ** (b * n + i)).cast("long"))
    return key
