"""Embeddings edge-corpus parity sweep (r13): the fifth fixture regime,
covering the one family the r12 robustness pin deliberately left out of
PARITY (it only asserted the plans execute over NULL/empty vectors —
those rows are engine-quarantined by documented convention and the
vector oracles cannot replay them). This sweep augments with
WIDTH-PRESERVING edge vectors both engines must process identically:

- a ZERO vector (norm 0 → cosine denominators hit 0/0: the engine's
  convention is NULL, an unguarded oracle division yields NaN — and
  DuckDB sorts NaN LARGEST, so an unguarded oracle would crown the zero
  vector top-1);
- an all-equal-components vector and a ±alternating vector (degenerate
  but legal geometry);
- an EXACT duplicate of an existing embedding under a new vec_id
  (exact cosine ties — every top-k/near-dup ordering must be pinned
  beyond the similarity value);
- a large-magnitude vector (1e3 components — float32 storage, double
  math, no overflow: magnitude robustness without crossing the f32
  horizon);
- a NULL label and a negative label (label arithmetic must not assume
  the generator's 0..9 range).

At 100 TB a zero vector from a failed embedding job and an exact
re-embed of the same content are certainties, not edge cases.
Self-maintaining: the query list is every ORACLE_SQL entry reading only
``embeddings``."""

from __future__ import annotations

import pathlib
import re
import shutil

import pytest

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import TABLES, compare, duckdb_connection

_DIM = 64


def _emb_only_queries() -> list[str]:
    names = []
    for name, sql in ORACLE_SQL.items():
        used = {t for t in TABLES if re.search(rf"\b{t}\b", sql)}
        if used == {"embeddings"}:
            names.append(name)
    return sorted(names)


def _vec(values: list[float]) -> str:
    assert len(values) == _DIM
    return "CAST([" + ", ".join(f"{v!r}" for v in values) + "] AS FLOAT[])"


# (vec_id, embedding SQL fragment, label) — ids far above the fixture max
# (499) so they never collide; 900003's embedding is spliced from vec 0
# inside the fixture builder (exact duplicate content, new id).
EDGE_VECTORS = [
    (900000, _vec([0.0] * _DIM), 3),
    (900001, _vec([1.0] * _DIM), 7),
    (900002, _vec([2.5 if i % 2 == 0 else -2.5 for i in range(_DIM)]), "NULL"),
    (900004, _vec([1e3 * ((i % 7) - 3) for i in range(_DIM)]), 0),
]


@pytest.fixture(scope="module")
def emb_edge_dir(sf_dir, tmp_path_factory):
    import duckdb

    out = tmp_path_factory.mktemp("emb_edge_sf")
    src = pathlib.Path(sf_dir) / "embeddings.parquet"
    values = ", ".join(f"({vid}, {emb}, {lbl})" for vid, emb, lbl in EDGE_VECTORS)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT vec_id, embedding, label FROM read_parquet('{src}')
          UNION ALL BY NAME
          SELECT vec_id, embedding, CAST(label AS INTEGER) AS label
          FROM (VALUES {values}) t(vec_id, embedding, label)
          UNION ALL BY NAME
          SELECT 900003 AS vec_id, embedding, CAST(-1 AS INTEGER) AS label
          FROM read_parquet('{src}') WHERE vec_id = 0
        ) TO '{out / "embeddings.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    for t in TABLES:
        s = pathlib.Path(sf_dir) / f"{t}.parquet"
        if t != "embeddings" and s.exists():
            shutil.copy(s, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def emb_edge_con(emb_edge_dir):
    con = duckdb_connection(emb_edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _emb_only_queries())
def test_embeddings_query_matches_oracle_on_edge_corpus(
    spark, emb_edge_dir, emb_edge_con, name
):
    result = compare(
        QUERIES[name](spark, emb_edge_dir), emb_edge_con, ORACLE_SQL[name]
    )
    assert result["count_match"], (name, result)
    assert result["schema_match"], (name, result)
    assert result["value_match"], {
        k: v for k, v in result.items() if k != "first_diffs"
    } | {"first_diffs": result.get("first_diffs")}
