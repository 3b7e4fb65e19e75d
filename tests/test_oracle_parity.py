"""Spark-vs-DuckDB parity for every declared query, at sf0.001 (fast local
replica of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    # Driver-canonicalizer contract: the gate sorts result cells with pandas,
    # which cannot order list/struct/map-typed values (round-2 failure mode:
    # "unhashable type: 'list'") — registered outputs must be scalar-only.
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, f"{name} emits driver-unsortable columns: {complex_cols}"
    if name not in ORACLE_SQL:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    result = compare(df, con, ORACLE_SQL[name])
    assert result["count_match"], result
    assert result["schema_match"], result
    assert result["value_match"], {k: v for k, v in result.items() if k != "first_diffs"} | {
        "first_diffs": result.get("first_diffs")
    }


def test_every_oracle_sql_parses(con):
    """EXPLAIN every registered oracle, catching syntax/binding errors in
    seconds without executing the queries (the full parity run catches them
    too, but only after minutes of Spark work). Collects ALL failures per
    run."""
    all_sql = dict(ORACLE_SQL)
    failures = []
    for name, sql in sorted(all_sql.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover - failure path
            failures.append(f"{name}: {exc}")
    assert not failures, "\n".join(failures)
