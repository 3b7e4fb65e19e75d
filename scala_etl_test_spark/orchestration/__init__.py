"""Orchestration shapes (SURVEY §3.3): cluster-lifecycle DAG specs for
submitting the engine as a managed-cluster job, mirroring the reference's
Airflow → Dataproc production entry point — spec-only, no cloud calls."""

from scala_etl_test_spark.orchestration.dag import (
    DagSpec,
    TaskSpec,
    build_etl_dag,
    cluster_config,
    pyspark_job,
)

__all__ = ["DagSpec", "TaskSpec", "build_etl_dag", "cluster_config", "pyspark_job"]
