"""Spark-vs-DuckDB parity for every declared query, at sf0.001 (fast local
replica of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    if name not in ORACLE_SQL:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    result = compare(QUERIES[name](spark, sf_dir), con, ORACLE_SQL[name])
    assert result["count_match"], result
    assert result["schema_match"], result
    assert result["value_match"], {k: v for k, v in result.items() if k != "first_diffs"} | {
        "first_diffs": result.get("first_diffs")
    }
