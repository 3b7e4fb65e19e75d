from __future__ import annotations

from pyspark.sql import functions as F

from scala_etl_test_spark.operators.layout import z_value, zorder_layout


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 1023) for y in (0, 2, 7, 512, 1023)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", z_value([F.col("x"), F.col("y")], bits=10).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton(r["x"], r["y"], 10), (r["x"], r["y"])


def test_z_value_ignores_high_bits(spark):
    df = spark.createDataFrame([(1024 + 5, 3)], "x long, y long")
    z = df.select(z_value([F.col("x"), F.col("y")], bits=10).alias("z")).first()["z"]
    assert z == _morton(5, 3, 10)


def test_zorder_layout_bounds_both_dims_per_partition(spark):
    # a 64x64 grid; after z-order range partitioning each partition must
    # cover a bounded sub-rectangle footprint in BOTH dimensions, which a
    # single-column sort cannot do for the second dimension.
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    laid = zorder_layout(df, [F.col("x"), F.col("y")], bits=6, num_partitions=16)
    spans = (
        laid.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.min("_zorder").alias("zmin"),
            F.max("_zorder").alias("zmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in spans) == 64 * 64
    # range partitioning: z intervals are disjoint across partitions
    ordered = sorted(spans, key=lambda r: r["zmin"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["zmax"] <= b["zmin"]
    # with ~256 cells per partition, a z-curve segment stays within a
    # fraction of the 0..63 extent on BOTH axes; a y-ignorant layout would
    # give sy == 63 everywhere.
    assert max(r["sx"] for r in spans) <= 32
    assert max(r["sy"] for r in spans) <= 32
