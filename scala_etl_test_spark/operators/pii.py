"""PII detection and redaction (beyond-reference; training-data hygiene).

Regex-based detectors for the classic machine-recognizable identifiers —
emails, NANP-style phone numbers, IPv4 addresses — as native Column
expressions: detection is ``regexp_extract_all`` counts and redaction a
chained ``regexp_replace``, so a 100 TB corpus pays one scan, zero shuffles,
and zero Python (whole-stage codegen end to end). The pattern set is
deliberately conservative/auditable (no speculative name/address NER —
that's a model pass, not a regex pass).

Patterns stay inside the regex subset shared by Java's engine and RE2
(character classes, bounded repeats, ``\\b``) so the DuckDB oracle runs the
byte-identical expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ordered: redaction applies in this order; longest-match classes first so
# e.g. an email is not half-eaten by a later pattern
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII class in a text column (long)."""
    t = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS[kind]), 0)).cast("long")


def redact_pii(col: Column | str) -> Column:
    """Replace every detected identifier with its ``<CLASS>`` placeholder —
    the reversible-audit form (class is preserved, value is not)."""
    t = F.col(col) if isinstance(col, str) else col
    for kind, pattern in PII_PATTERNS.items():
        t = F.regexp_replace(t, pattern, f"<{kind.upper()}>")
    return t


def detect_pii(
    df: DataFrame, text_col: str, id_col: str, passthrough: list[str] | None = None
) -> DataFrame:
    """Per-document PII profile: one count column per class plus the
    redacted text and a ``has_pii`` flag. Row-local; no shuffle.
    ``passthrough`` keeps extra columns (e.g. the shard/source key) in the
    output so downstream rollups never need to join back to the input —
    a row-local operator must stay a single scan."""
    counts = {kind: pii_count(text_col, kind) for kind in PII_PATTERNS}
    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in (passthrough or [])],
        *[c.alias(f"n_{kind}") for kind, c in counts.items()],
        redact_pii(text_col).alias("redacted"),
    )
    has = None
    for kind in PII_PATTERNS:
        flag = F.col(f"n_{kind}") > 0
        has = flag if has is None else (has | flag)
    return out.withColumn("has_pii", has)
