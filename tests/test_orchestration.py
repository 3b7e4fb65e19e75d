"""Orchestration DAG spec: topology, payload shape, and env resolution must
mirror the reference's create → submit → delete chain (spark_dag.py:26-82)."""

from __future__ import annotations

from scala_etl_test_spark.orchestration import build_etl_dag, cluster_config, pyspark_job


def test_chain_topology_and_cleanup_guarantee():
    dag = build_etl_dag(env={})
    assert dag.task_ids == ["create_cluster", "spark_task", "delete_cluster"]
    assert [t.action for t in dag.tasks] == ["create_cluster", "submit_job", "delete_cluster"]
    # the delete task must run even when the job fails — an ephemeral
    # cluster that leaks on failure is the expensive orchestration bug
    assert dag.tasks[-1].always_run
    assert not dag.tasks[0].always_run
    assert dag.schedule is None  # manual trigger, like the reference


def test_env_parameters_resolve_like_reference():
    env = {
        "GCP_PROJECT_ID": "p1",
        "GCP_DATAPROC_CLUSTER_NAME": "c1",
        "GCP_LOCATION": "r1",
        "GCP_DATAPROC_BUCKET": "b1",
    }
    dag = build_etl_dag(env=env)
    create, submit, delete = dag.tasks
    assert create.payload["project_id"] == "p1"
    assert create.payload["cluster_name"] == "c1"
    assert create.payload["region"] == "r1"
    assert submit.payload["job"]["placement"]["cluster_name"] == "c1"
    assert delete.payload == {"project_id": "p1", "region": "r1", "cluster_name": "c1"}
    # defaults mirror the reference when unset
    d2 = build_etl_dag(env={})
    assert d2.tasks[0].payload["region"] == "southamerica-east1"
    assert d2.tasks[0].payload["project_id"] == "project_id"


def test_pyspark_job_payload_matches_cli_contract():
    job = pyspark_job("p", "c", "bkt", extra_args=["--csv-watermark", "3"])
    pj = job["pyspark_job"]
    assert pj["main_python_file_uri"] == "gs://bkt/cli.py"
    assert pj["python_file_uris"] == ["gs://bkt/scala_etl_test_spark.zip"]
    # -r output path and -c config are the cli.py required surface
    args = pj["args"]
    assert args[args.index("-r") + 1] == "gs://bkt/scala_etl_test_spark/"
    assert args[args.index("-c") + 1] == "gs://bkt/application.properties"
    assert args[-2:] == ["--csv-watermark", "3"]


def test_cluster_config_shape():
    cfg = cluster_config(num_workers=8, worker_machine="n2-highmem-16")
    assert cfg["master_config"]["num_instances"] == 1
    assert cfg["worker_config"]["num_instances"] == 8
    assert cfg["worker_config"]["machine_type_uri"] == "n2-highmem-16"
    for side in ("master_config", "worker_config"):
        assert set(cfg[side]) == {"num_instances", "machine_type_uri", "disk_config"}
