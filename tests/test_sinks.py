"""Sinks: compaction collapses a many-partition write into few size-targeted
files; sort_by clusters rows for row-group pruning; data round-trips."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from scala_etl_test_spark.sources.parquet_source import read_table
from scala_etl_test_spark.sources.sinks import write_compacted


def test_compacted_write_few_files_roundtrip(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem").repartition(64)  # simulate fragmented input
    out = str(tmp_path / "compact")
    n = write_compacted(li, out, target_mb=128)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n
    assert n < 8  # sf0.001 lineitem is far under one 128 MB target file
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert sorted(back.columns) == sorted(li.columns)


def test_compacted_sorted_write_clusters_rows(spark, sf_dir, tmp_path):
    li = read_table(spark, sf_dir, "lineitem")
    out = str(tmp_path / "sorted")
    write_compacted(li, out, target_mb=1024, sort_by=["l_shipdate"])
    back = spark.read.parquet(out)
    # rows within the (single) file are non-decreasing on the sort key
    ts = [r["l_shipdate"] for r in back.select("l_shipdate").collect()]
    assert ts == sorted(ts)
