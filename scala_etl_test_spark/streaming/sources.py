"""Structured Streaming sources (beyond-reference; SURVEY.md §2.9).

The reference has no streaming — its only incremental capability is the two
batch watermarks (file-number listing at ``ApplaudoETL.scala:88-99`` and the
JDBC ``order_id`` subquery at ``:101-113``). These sources are the idiomatic
Spark upgrade of the file-number watermark: a Structured Streaming file
source whose **checkpoint** tracks processed files, giving exactly-once
incremental ingestion without any hand-rolled watermark bookkeeping — new
files in the directory are picked up on the next trigger, already-seen files
never reprocess.

Scale notes:
- File-source listing is driver-side metadata; for object stores with
  millions of files, cap per-trigger work with ``maxFilesPerTrigger`` and
  prefer date-partitioned directories so listing stays bounded.
- ``Trigger.AvailableNow`` drains the backlog with the same bounded-batch
  semantics and then stops — the batch/stream unification used by the tests.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from scala_etl_test_spark.schemas import PRODUCT_SCHEMA

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# With spark.sql.legacy.parquet.nanosAsLong (set in session.build_session),
# TIMESTAMP(NANOS) parquet columns surface as LongType nanos.
EVENTS_NANOS_SCHEMA = T.StructType(
    [f if f.name != "ts" else T.StructField("ts", T.LongType()) for f in EVENTS_SCHEMA.fields]
)


def stream_orders_csv(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """Streaming twin of ``sources.csv_source.read_orders_csv`` — the same
    dialect (headerless, ``escape='"'``, DROPMALFORMED, declared schema;
    reference S1 at ``ApplaudoETL.scala:77-86``), but incremental via the
    stream checkpoint instead of the file-number watermark (S2)."""
    reader = (
        spark.readStream.schema(PRODUCT_SCHEMA)
        .option("header", "false")
        .option("escape", '"')
        .option("mode", "DROPMALFORMED")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(path)


def stream_events_parquet(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the events table (directory of parquet files).

    Streaming sources need a declared schema, but the generator's physical
    encoding of ``ts`` has varied (TIMESTAMP(NANOS) → long nanos under
    ``nanosAsLong``; timestamp[us] without tz → TIMESTAMP_NTZ), so probe the
    footer once with a batch read (driver-side metadata only, no data scan)
    and normalize exactly like ``parquet_source.read_table`` — streaming and
    batch plans then see identical session-tz TIMESTAMP event times.

    An empty / not-yet-populated source directory (a normal streaming
    startup state) has no footer to probe — ``spark.read.parquet`` raises
    AnalysisException ("Unable to infer schema") — so fall back to the
    generator's current encoding (long nanos) rather than dying before the
    first file lands."""
    try:
        probed = spark.read.parquet(path).schema["ts"].dataType
    except AnalysisException:  # empty dir / no readable footer yet
        probed = T.LongType()
    def _reader(schema):
        r = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return r

    if isinstance(probed, T.LongType):
        df = _reader(EVENTS_NANOS_SCHEMA).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(probed, T.TimestampNTZType):
        ntz_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
                for f in EVENTS_SCHEMA.fields
            ]
        )
        df = _reader(ntz_schema).parquet(path)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return _reader(EVENTS_SCHEMA).parquet(path)


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents_parquet(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the documents corpus (directory of parquet files) —
    the ingest side of a continuously-fed training-data pipeline. Row-local
    curation operators (PII scan/redaction, quality stats, token counts,
    fingerprints) apply to this stream unchanged in append mode; aggregating
    operators need a watermark or the batch path (incremental dedup runs
    per micro-batch via :mod:`streaming.dedup`)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def run_available_now(
    sdf: DataFrame,
    checkpoint: str,
    output_mode: str = "append",
    query_name: str = "etl_stream",
    sink_format: str = "memory",
    sink_path: str | None = None,
) -> None:
    """Drain all currently-available input (``Trigger.AvailableNow``) into a
    sink and block until done. Memory sink for tests; parquet for pipelines."""
    writer = (
        sdf.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .format(sink_format)
        .queryName(query_name)
    )
    if sink_path is not None:
        writer = writer.option("path", sink_path)
    q = writer.start()
    q.awaitTermination()
