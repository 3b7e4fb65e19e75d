"""SparkSession bootstrap.

Reference: ``StartETL.scala:30`` builds ``local[*]`` with a fixed appName.
Here the builder also turns on the Spark-3 features the reference could not
use (AQE, skew-join handling) — these are the scale levers that let the same
logical plans survive a 100 TB cluster run (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "scala-etl-test-spark"


def build_session(
    master: str | None = None,
    app_name: str = APP_NAME,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-sane defaults.

    - AQE on: runtime shuffle coalescing + skew-join splitting replaces the
      reference's fixed ``spark.sql.shuffle.partitions=200``.
    - Arrow on: any pandas-UDF extension point transfers via Arrow batches.
    - Local mode sizes shuffle partitions to the local core count; on a real
      cluster leave ``shuffle_partitions=None`` and let AQE coalesce from a
      high initial value.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # read TIMESTAMP(NANOS) parquet (events.ts) as long nanos; converted
        # to micro-precision timestamps in sources.parquet_source.read_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local mode runs driver+executors in ONE JVM whose heap defaults to
        # 1g regardless of machine RAM — at 10× the gate SF that OOMs the
        # first broadcast build. Only takes effect when THIS process starts
        # the JVM (ignored on an already-running session).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    if master:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
