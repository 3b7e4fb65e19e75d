"""PySpark-native analytics engine with the capabilities of the reference
``carlossegovia/scala-etl-test`` (a Scala/Spark 2.4.6 ETL pipeline), rebuilt
Spark-first on the DataFrame/SQL API (Spark >= 3.5).

Layout
------
- :mod:`scala_etl_test_spark.schemas` — explicit StructType schemas
  (reference: case classes at ``ApplaudoETL.scala:15-18``).
- :mod:`scala_etl_test_spark.sources` — CSV/JDBC/API/parquet sources with
  batch watermark incrementality (``ApplaudoETL.scala:77-142``).
- :mod:`scala_etl_test_spark.operators` — transform/validate/category/
  segmentation parity operators plus beyond-reference training-data
  operators (dedup, similarity search, text analysis, multimodal).
- :mod:`scala_etl_test_spark.plans` — pipeline orchestration
  (``ApplaudoETL.scala:31-67`` equivalent).
- :mod:`scala_etl_test_spark.streaming` — Structured-Streaming upgrades of
  the reference's batch watermark ingestion (beyond-reference, marked).

Everything compiles to native Column expressions — no row-level Python UDFs
in any hot path; Python touches data only through Arrow-batched pandas UDFs
in clearly-marked extension points.
"""

__version__ = "0.1.0"
