"""Spark-vs-DuckDB parity for every declared query, at sf0.001 (fast local
replica of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from scala_etl_test_spark.plans.queries import BOUNDED_ORACLE, ORACLE_SQL, QUERIES

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
        if name in BOUNDED_ORACLE:
            # sketch queries can't hash-match across engines, but must sit
            # within the sketch's published error bound of DuckDB's exact
            exact_sql, est_col, rel_tol = BOUNDED_ORACLE[name]
            exact_pdf = con.execute(exact_sql).fetchdf()
            key_cols = [c for c in exact_pdf.columns if c != est_col]
            exact = {tuple(r[k] for k in key_cols): r[est_col] for _, r in exact_pdf.iterrows()}
            got = {tuple(r[k] for k in key_cols): r[est_col] for r in df.collect()}
            assert got.keys() == exact.keys(), (sorted(got), sorted(exact))
            for key, exact_n in exact.items():
                assert abs(got[key] - exact_n) <= max(1, rel_tol * exact_n), (
                    name,
                    key,
                    got[key],
                    exact_n,
                    rel_tol,
                )
        return
    result = compare(QUERIES[name](spark, sf_dir), con, ORACLE_SQL[name])
    assert result["count_match"], result
    assert result["schema_match"], result
    assert result["value_match"], {k: v for k, v in result.items() if k != "first_diffs"} | {
        "first_diffs": result.get("first_diffs")
    }


def test_every_oracle_sql_parses(con):
    """EXPLAIN every registered oracle — including the BOUNDED_ORACLE
    exact-count SQLs — catching syntax/binding errors in seconds without
    executing the queries (the full parity run catches them too, but only
    after minutes of Spark work). Collects ALL failures per run."""
    all_sql = dict(ORACLE_SQL) | {
        f"{name} (bounded exact)": spec[0] for name, spec in BOUNDED_ORACLE.items()
    }
    failures = []
    for name, sql in sorted(all_sql.items()):
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover - failure path
            failures.append(f"{name}: {exc}")
    assert not failures, "\n".join(failures)
