"""CSV source with file-number watermark incrementality.

Reference: ``getDataFromBlobStorage`` + ``getFileNames``
(ApplaudoETL.scala:77-99) — headerless quoted CSV with a declared schema,
``escape='"'``, DROPMALFORMED; incremental ingestion keeps only files whose
numeric basename exceeds the watermark (``02.csv`` → 2).

The directory listing goes through Spark's Hadoop FileSystem (via the JVM
gateway) so the same code lists ``file://``, ``hdfs://``, ``wasbs://``, or
``s3a://`` paths — the driver→storage boundary the reference crosses at
``ApplaudoETL.scala:94-99``. Listing is a driver-side metadata op (cheap even
for thousands of files); the data read itself is fully distributed.

The reference's dead warm-up scan (``spark.read.csv(s"$path/00.csv")`` at
``:79``, result discarded) is intentionally NOT replicated (SURVEY §2.1 S10).

Known Spark quirk (kept — it is the scale-friendly behavior): with CSV column
pruning, an action that requires **zero** parsed columns (a bare ``count()``)
never exercises the parser, so DROPMALFORMED cannot drop anything and raw
line counts are returned. Any real query that touches a column gets the
documented malformed-row filtering. See SPARK-21610/SPARK-22112.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from scala_etl_test_spark.schemas import PRODUCT_SCHEMA


def list_files_above_watermark(
    spark: SparkSession, path: str, file_number: int = -1, suffix: str = ".csv"
) -> list[str]:
    """List ``path`` and keep files whose numeric basename > ``file_number``
    (ApplaudoETL.scala:94-99). ``file_number=-1`` keeps everything."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI(path)
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, hconf)
    statuses = fs.listStatus(jvm.org.apache.hadoop.fs.Path(path))
    out = []
    for status in statuses:
        p = status.getPath().toString()
        base = p.split("/")[-1]
        if suffix and not base.endswith(suffix):
            continue
        stem = base.split(".")[0]
        try:
            num = int(stem)
        except ValueError:
            continue
        if num > file_number:
            out.append(p)
    return sorted(out)


def read_orders_csv(
    spark: SparkSession,
    path: str,
    file_number: int = -1,
    schema: T.StructType = PRODUCT_SCHEMA,
) -> DataFrame:
    """Watermark-pruned CSV scan with the reference's exact dialect
    (ApplaudoETL.scala:82-85): declared schema (no inference pass),
    headerless, quote-escape ``"``, malformed rows dropped at scan."""
    files = list_files_above_watermark(spark, path, file_number)
    if not files:
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema)
        .option("header", "false")
        .option("escape", '"')
        .option("mode", "DROPMALFORMED")
        .csv(files)
    )
