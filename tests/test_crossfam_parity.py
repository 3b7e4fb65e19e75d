"""Cross-family edge-corpus parity sweep (r13): the fourth fixture
regime. The docs/events/relational sweeps each cover queries whose
oracles read ONLY their own table family — which leaves exactly the
multi-family queries (PIT feature assembly over customer+events, the
erasure family over documents+embeddings, the release report over
documents+events, ...) with no parity row over edge rows at all, even
though they traverse BOTH families' edge semantics in one plan (a NULL
event timestamp flowing into an as-of join against a NULL-balance
customer is precisely the composition the single-family sweeps cannot
reach).

Fixture: sf0.001 with documents+events augmented by the nullcorpus edge
rows AND all seven relational tables augmented by the relcorpus edge
rows — imported from the sibling sweeps, so new edge rows added there
flow here automatically. ``embeddings`` stays verbatim: its oracles
hardcode vector-width arithmetic (the width-preserving embeddings edge
sweep is its own regime in test_embcorpus_parity.py).

Self-maintaining: the query list is every ORACLE_SQL entry whose table
set is NOT covered by one of the single-family sweeps and does not
require augmented embeddings — new cross-family queries join
automatically."""

from __future__ import annotations

import pathlib
import re
import shutil

import pytest

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import TABLES, compare, duckdb_connection
from tests.test_nullcorpus_parity import (
    EDGE_DOCS,
    EDGE_EVENTS,
    _values_sql,
)
from tests.test_relcorpus_parity import _AUGMENTED as _REL_AUGMENTED
from tests.test_relcorpus_parity import _REL_TABLES


def _cross_family_queries() -> list[str]:
    names = []
    for name, sql in ORACLE_SQL.items():
        used = {t for t in TABLES if re.search(rf"\b{t}\b", sql)}
        single_family = (
            used == {"documents"}
            or used == {"events"}
            or used == {"embeddings"}
            or (used and used <= _REL_TABLES)
        )
        if used and not single_family:
            names.append(name)
    return sorted(names)


_AUGMENTED = {
    **_REL_AUGMENTED,
    "documents": (EDGE_DOCS, "t(doc_id, text, lang, source, n_chars)"),
    "events": (EDGE_EVENTS, "t(event_id, ts, user_id, event_type, value, props)"),
}


@pytest.fixture(scope="module")
def cross_edge_dir(sf_dir, tmp_path_factory):
    """sf0.001 with EVERY table except embeddings carrying its family's
    edge rows. Single-FILE parquet via DuckDB COPY, column list cast to
    the source schema (same recipe as the sibling sweeps)."""
    import duckdb

    out = tmp_path_factory.mktemp("cross_edge_sf")
    con = duckdb.connect()
    for t in TABLES:
        src = pathlib.Path(sf_dir) / f"{t}.parquet"
        if not src.exists():
            continue
        if t in _AUGMENTED:
            rows, alias = _AUGMENTED[t]
            cols = [
                r[0]
                for r in con.execute(
                    f"describe select * from read_parquet('{src}')"
                ).fetchall()
            ]
            col_list = ", ".join(cols)
            con.execute(
                f"""
                COPY (
                  SELECT * FROM (
                    SELECT {col_list} FROM read_parquet('{src}')
                    UNION ALL BY NAME
                    SELECT {col_list} FROM (VALUES {_values_sql(rows)}) {alias}
                  )
                ) TO '{out / (t + ".parquet")}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copy(src, out / f"{t}.parquet")
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def cross_edge_con(cross_edge_dir):
    con = duckdb_connection(cross_edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _cross_family_queries())
def test_cross_family_query_matches_oracle_on_edge_corpus(
    spark, cross_edge_dir, cross_edge_con, name
):
    result = compare(
        QUERIES[name](spark, cross_edge_dir), cross_edge_con, ORACLE_SQL[name]
    )
    assert result["count_match"], (name, result)
    assert result["schema_match"], (name, result)
    assert result["value_match"], {
        k: v for k, v in result.items() if k != "first_diffs"
    } | {"first_diffs": result.get("first_diffs")}
