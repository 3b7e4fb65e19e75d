"""Content-integrity checksums for replica / migration validation.

The question after every copy, engine swap, compaction, or bucketing
rewrite is "is the data still EXACTLY the same?" — and the answer must
not depend on row order, partitioning, or file layout. The checksum here
is an ORDER-INDEPENDENT pair of aggregates over a per-row digest:

- ``xor60`` — bitwise XOR of each row's 60-bit md5 digest. Associative,
  commutative, overflow-free; any single changed/extra/missing row flips
  it. Weakness: a row duplicated an EVEN number of times cancels out.
- ``sum31`` — sum of the digest's low 31 bits, covering exactly the XOR
  blind spot (duplicate multiplicity moves the sum). 2⁶³/2³¹ ≈ 4·10⁹ rows
  fit before signed-64 overflow; shift to sum-mod-2⁶³ arithmetic (or
  split sums) beyond that.

Together with the row count, matching (n_rows, xor60, sum31) between two
tables is a strong (not cryptographic) equality check that computes in
one scan per side with map-side partial aggregation — each exchange
carries ONE row per task, so the comparison costs two table scans and
nothing else, at any scale.

The row digest hashes a CALLER-CANONICALIZED string encoding: the caller
formats every column to a cross-engine-stable string (decimals with fixed
scale, timestamps via strftime — see q_orders_checksum) and NULLs are
encoded distinctly from empty strings via a printable sentinel (a column
whose actual string value equals the sentinel collides with NULL — pick a
sentinel outside the data's alphabet for such columns). md5 is the repo's
portable hash family (swap xxhash64 in production for speed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

NULL_SENTINEL = "<NULL>"


def row_digest(cols: Sequence[Column | str]) -> Column:
    """60-bit md5 digest of the row: each column is md5-hashed FIRST and
    the fixed-width hex digests concatenate — a delimiter-joined encoding
    would be injectable (('a|b','c') and ('a','b|c') alias); fixed-width
    per-column digests cannot shift content across column boundaries."""
    parts = [
        F.md5(
            F.coalesce(
                (F.col(c) if isinstance(c, str) else c).cast("string"),
                F.lit(NULL_SENTINEL),
            )
        )
        for c in cols
    ]
    return F.conv(F.substring(F.md5(F.concat(*parts)), 1, 15), 16, 10).cast("long")


def table_checksum(df: DataFrame, cols: Sequence[Column | str]) -> DataFrame:
    """One-row (n_rows, xor60, sum31) content checksum over ``cols``."""
    h = row_digest(cols).alias("_h")
    return df.select(h).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.expr("bit_xor(_h)"), F.lit(0)).cast("long").alias("xor60"),
        F.coalesce(F.sum(F.col("_h") % F.lit(1 << 31)), F.lit(0))
        .cast("long")
        .alias("sum31"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: Sequence[Column | str],
) -> DataFrame:
    """Release-to-release corpus diff: classify every id as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` — the governance artifact a
    corpus release ships so consumers audit WHAT moved between versions
    without re-scanning payloads themselves (the release twin of
    :func:`table_checksum`, which only answers whether ANYTHING moved).

    Scale shape: each side reduces row-locally to (id, 60-bit content
    digest of ``content_cols`` via :func:`row_digest`) — so the join that
    follows carries two thin columns, never payloads — then ONE full-outer
    equi-join on the id classifies everything. One shuffle per side at
    100 TB (zero if both releases are bucketed on the id, the layout
    operators/layout.py recommends for exactly this reason); digests make
    'changed' detection O(1) per id regardless of document size.

    Returns (id, status). Aggregate with :func:`snapshot_diff_summary`
    for the release-note row counts.
    """
    oh = old.select(F.col(id_col), row_digest(content_cols).alias("_h_old"))
    nh = new.select(F.col(id_col), row_digest(content_cols).alias("_h_new"))
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") == F.col("_h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return oh.join(nh, on=id_col, how="full_outer").select(
        F.col(id_col), status.alias("status")
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n_docs) release-note summary of :func:`snapshot_diff` —
    a ≤4-group aggregate over the already-thin diff frame."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
