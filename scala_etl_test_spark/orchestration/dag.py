"""Cluster-lifecycle DAG spec for the engine's batch entry point.

Mirrors the reference's production orchestration
(``src/main/resources/airflow/spark_dag.py:26-82``): an ephemeral-cluster
three-task chain — create cluster → submit job → delete cluster — with
env-var-driven project/region/bucket parameters and the job payload as a
plain dict. Two deliberate differences:

- The job is a **PySpark** job (``main_python_file_uri`` running
  ``scala_etl_test_spark.cli`` with the packaged engine shipped via
  ``python_file_uris``), not a JVM ``main_class`` jar — this engine is
  Python-native.
- The spec layer is **dependency-free data structures** (no Airflow import,
  no cloud SDK calls): :func:`build_etl_dag` returns an ordered
  :class:`DagSpec` that an Airflow DAG file, a Step Functions state
  machine, or a plain shell driver can render 1:1. Orchestrators differ
  per shop; the submit payload and task topology are the portable part,
  and they are what the unit tests pin.

Scale note: the ephemeral create→run→delete shape is the right one for a
100 TB batch — capacity exists only while the job runs, and a wedged
cluster cannot leak (delete runs regardless of job outcome via
``always_run``, the spec twin of Airflow's ``trigger_rule=ALL_DONE``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TaskSpec:
    """One orchestration task: an action name + its declarative payload."""

    task_id: str
    action: str  # create_cluster | submit_job | delete_cluster
    payload: dict
    always_run: bool = False  # run even if upstream failed (cleanup tasks)


@dataclass(frozen=True)
class DagSpec:
    """An ordered chain of tasks (a >> b >> c in Airflow terms)."""

    dag_id: str
    tasks: tuple[TaskSpec, ...]
    schedule: str | None = None  # None = manual trigger, like the reference

    @property
    def task_ids(self) -> list[str]:
        return [t.task_id for t in self.tasks]


def cluster_config(
    master_machine: str = "n1-standard-2",
    worker_machine: str = "n1-standard-4",
    num_workers: int = 2,
    boot_disk_gb: int = 1024,
) -> dict:
    """Ephemeral-cluster shape of the reference DAG (spark_dag.py:27-38):
    1 master + N workers, standard boot disks. At real scale, workers and
    machine types are the knobs; the structure is unchanged."""
    return {
        "master_config": {
            "num_instances": 1,
            "machine_type_uri": master_machine,
            "disk_config": {"boot_disk_type": "pd-standard", "boot_disk_size_gb": boot_disk_gb},
        },
        "worker_config": {
            "num_instances": num_workers,
            "machine_type_uri": worker_machine,
            "disk_config": {"boot_disk_type": "pd-standard", "boot_disk_size_gb": boot_disk_gb},
        },
    }


def pyspark_job(
    project_id: str,
    cluster_name: str,
    bucket: str,
    output_folder: str = "scala_etl_test_spark",
    config_uri: str | None = None,
    extra_args: list[str] | None = None,
) -> dict:
    """The submit payload (reference SPARK_JOB, spark_dag.py:45-56), as a
    PySpark job: ``cli.py`` is the entry file, the packaged engine rides
    along as a zip, and ``-r``/``-c`` args match the CLI contract
    (scala_etl_test_spark/cli.py)."""
    output_path = f"gs://{bucket}/{output_folder}/"
    config = config_uri or f"gs://{bucket}/application.properties"
    return {
        "reference": {"project_id": project_id},
        "placement": {"cluster_name": cluster_name},
        "pyspark_job": {
            "main_python_file_uri": f"gs://{bucket}/cli.py",
            "python_file_uris": [f"gs://{bucket}/scala_etl_test_spark.zip"],
            "args": ["-r", output_path, "-c", config, *(extra_args or [])],
        },
    }


def build_etl_dag(env: dict[str, str] | None = None) -> DagSpec:
    """The full create → submit → delete chain with parameters resolved from
    the same env-var names the reference DAG reads (spark_dag.py:12-16),
    defaulting identically when unset."""
    env = dict(os.environ if env is None else env)
    project_id = env.get("GCP_PROJECT_ID", "project_id")
    cluster_name = env.get("GCP_DATAPROC_CLUSTER_NAME", "cluster-name")
    region = env.get("GCP_LOCATION", "southamerica-east1")
    bucket = env.get("GCP_DATAPROC_BUCKET", "bucket-name")

    create = TaskSpec(
        task_id="create_cluster",
        action="create_cluster",
        payload={
            "project_id": project_id,
            "region": region,
            "cluster_name": cluster_name,
            "cluster_config": cluster_config(),
        },
    )
    submit = TaskSpec(
        task_id="spark_task",
        action="submit_job",
        payload={
            "project_id": project_id,
            "location": region,
            "job": pyspark_job(project_id, cluster_name, bucket),
        },
    )
    delete = TaskSpec(
        task_id="delete_cluster",
        action="delete_cluster",
        payload={"project_id": project_id, "region": region, "cluster_name": cluster_name},
        always_run=True,
    )
    return DagSpec(dag_id="scala_etl_test_spark_batch", tasks=(create, submit, delete))
