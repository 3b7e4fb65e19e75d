"""Sinks (SURVEY §2.1 S7/S8).

Reference: ``storeData`` (ApplaudoETL.scala:283-285) writes
``overwrite``-mode parquet, one directory per logical table; console fallback
is ``show(10, truncate=false)`` (``:53``, ``:65``).

Scale notes: partition-by and bucketing knobs exposed so the same sink writes
a 100 TB table as a partitioned layout readers can prune
(``partitionBy=["order_dow"]`` etc.); the reference's flat layout remains the
default for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def store_parquet(
    df: DataFrame,
    base_path: str,
    table_name: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{base_path}/{table_name}")


def show_console(df: DataFrame, n: int = 10) -> None:
    df.show(n, truncate=False)


def write_table(
    df: DataFrame,
    fmt: str,
    path: str | None = None,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Generic ``DataFrameWriter`` passthrough — the S9 parity surface.

    The reference's notebook-only BigQuery sink (ApplaudoETL.ipynb cell 24)
    is exactly this shape with ``fmt="bigquery"`` and options like
    ``{"table": "dataset.table", "temporaryGcsBucket": "bucket"}`` once the
    spark-bigquery connector jar is on the classpath — no engine change
    needed, which is why the sink surface is a thin passthrough rather than
    a per-vendor module. Connector formats take their destination from
    ``options`` (leave ``path=None``); file formats (parquet/csv/json/orc)
    take ``path``.
    """
    writer = df.write.format(fmt).mode(mode).options(**(options or {}))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)  # save(None) = connector destination from options


def write_compacted(
    df: DataFrame,
    path: str,
    target_mb: int = 128,
    mode: str = "overwrite",
    sort_by: list[str] | None = None,
    range_partition: bool = False,
) -> int:
    """Write parquet compacted to ~``target_mb`` files — the small-files
    mitigation (a 100 TB table written from thousands of tasks otherwise
    lands as millions of KB-sized objects that throttle any object store's
    listing and per-request costs).

    File count comes from the optimizer's size estimate of the plan (driver
    metadata only, no extra pass). ``sort_by`` additionally orders rows
    within each output file so parquet row-group min/max stats prune reads
    on those columns (poor man's clustering). ``range_partition``
    additionally RANGE-partitions on ``sort_by`` before writing, so each
    key lands in one file and equality probes prune at FILE level — plain
    ``repartition`` is round-robin and scatters every key across every
    file, limiting pruning to row groups. Returns the partition count.
    """
    size_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n_files = max(1, int(int(size_bytes) // (target_mb * 1024 * 1024)) + 1)
    if range_partition and sort_by:
        out = df.repartitionByRange(n_files, *sort_by)
    else:
        out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode(mode).parquet(path)
    return n_files


def bigquery_options(
    table: str,
    project: str | None = None,
    temporary_gcs_bucket: str | None = None,
    write_method: str = "indirect",
) -> dict[str, str]:
    """Option dict for the spark-bigquery connector (SURVEY §2.1 S9 —
    the reference's notebook-only aspirational sink,
    ``ApplaudoETL.ipynb`` cell 24). Pure and unit-testable: the
    ``indirect`` method stages via a GCS bucket (required by the
    connector), ``direct`` uses the BigQuery Storage Write API and
    needs no bucket."""
    if write_method not in ("indirect", "direct"):
        raise ValueError(f"write_method must be direct|indirect, got {write_method!r}")
    if write_method == "indirect" and not temporary_gcs_bucket:
        raise ValueError("indirect BigQuery writes require temporary_gcs_bucket")
    opts = {"table": table, "writeMethod": write_method}
    if project:
        opts["parentProject"] = project
    if temporary_gcs_bucket:
        opts["temporaryGcsBucket"] = temporary_gcs_bucket
    return opts


def write_bigquery(
    df: DataFrame,
    table: str,
    project: str | None = None,
    temporary_gcs_bucket: str | None = None,
    mode: str = "overwrite",
    write_method: str = "indirect",
) -> None:
    """BigQuery sink passthrough — completes the reference's sink surface
    (S9). CONNECTOR-GATED: the spark-bigquery-with-dependencies jar is not
    bundled here (cloud connector, not part of a local engine); without it
    on the classpath the save fails and this wrapper re-raises with the
    exact --packages coordinate to add. Everything up to the jar boundary
    (format, option plumbing, mode) is real and unit-tested."""
    opts = bigquery_options(table, project, temporary_gcs_bucket, write_method)
    writer = df.write.format("bigquery").mode(mode).options(**opts)
    try:
        writer.save()
    except Exception as exc:  # connector absent in this environment
        # Only the missing-data-source signatures get the --packages hint
        # (ADVICE r4): with the connector INSTALLED, auth/table/schema
        # failures also mention "bigquery" and must surface unchanged.
        msg = str(exc)
        missing_source = (
            "DATA_SOURCE_NOT_FOUND" in msg
            or "Failed to find data source: bigquery" in msg
            or ("ClassNotFoundException" in msg and "bigquery" in msg.lower())
        )
        if missing_source:
            raise RuntimeError(
                "BigQuery connector not on the classpath; launch with "
                "--packages com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.41.0"
            ) from exc
        raise
