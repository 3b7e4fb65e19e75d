"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the bytes: parquet
keeps min/max statistics per file and row group, and Spark prunes scans
with them — but a table sorted by one column has random order in every
other column, so only that one dimension prunes. Z-ordering (Morton curve)
interleaves the bits of several dimensions into one sort key; sorting by it
bounds the value range of EVERY participating dimension within each file,
so selective filters on any of them skip most of the data. This is the
standard layout trick of lakehouse table formats, expressed here with plain
DataFrame ops: compute the key, range-partition on it, sort within
partitions, write.

The bit interleave is a pure JVM-side Column expression (unrolled
shift/mask/or — whole-stage-codegen-able, no UDF), so the only cost over a
plain sort is the key arithmetic; the shuffle is the same single range
exchange any global sort pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def z_value(cols: list[Column], bits: int = 10) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    dimension, dimension 0 in the lowest position. Inputs must be
    non-negative integers already quantized to ``bits`` bits (higher bits
    are ignored — equivalently, values are taken mod 2**bits); quantize
    floats with a monotone bucketing first, e.g.
    ``least(greatest(floor(x), 0), 2**bits - 1)``."""
    if not cols:
        raise ValueError("z_value needs at least one column")
    d = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    bits: int = 10,
    num_partitions: int | None = None,
    key_name: str = "_zorder",
) -> DataFrame:
    """Cluster ``df`` on the Z-order curve of ``cols``: range-partition by
    the interleaved key and sort within partitions, so a subsequent
    file-per-partition write carries tight per-file min/max bounds on every
    participating dimension. The key column is left in the output under
    ``key_name`` (drop it before writing if the consumer shouldn't see it;
    keeping it gives the reader an explicit coarse spatial index)."""
    z = z_value(cols, bits=bits).alias(key_name)
    out = df.withColumn(key_name, z)
    if num_partitions is not None:
        out = out.repartitionByRange(num_partitions, F.col(key_name))
    else:
        out = out.repartitionByRange(F.col(key_name))
    return out.sortWithinPartitions(key_name)
