"""Edge-corpus parity sweep (r12): every registry query whose oracle reads
ONLY the documents table, value-hash-compared across engines over the
sf0.001 corpus AUGMENTED with the edge rows the generated fixtures never
contain — NULL text / NULL lang / NULL source, empty and whitespace-only
strings, multi-byte unicode, a 'BM' image-signature prefix, pathological
token shapes. The r12 multimodal NULL fixes (md5-of-nothing vs NULL,
greatest(NULL,0) frame invention) were all latent divergences exactly
this class of row exposes; this sweep pins the whole documents family
against the next one. Self-maintaining: the query list is derived from
ORACLE_SQL table references, so new documents-only queries join the sweep
automatically."""

from __future__ import annotations

import pathlib
import re
import shutil

import pytest

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import TABLES, compare, duckdb_connection


def _doc_only_queries() -> list[str]:
    names = []
    for name, sql in ORACLE_SQL.items():
        used = {t for t in TABLES if re.search(rf"\b{t}\b", sql)}
        if used == {"documents"}:
            names.append(name)
    return sorted(names)


EDGE_ROWS = [
    # (doc_id, text, lang, source, n_chars) — ids far above the fixture max
    (100000, None, None, "src0", None),
    (100001, "", "en", "src1", 0),
    (100002, "BM short image-signature prose", "en", "web", 30),
    (100003, "múltí-byte ünïcôde — high nibbles differ from ASCII ©", "de", "books", 53),
    (100004, " \t  \n ", None, "src2", 6),
    (100005, "x", "en", None, 1),
    (100006, "the the the the the the the the", "en", "src3", 31),
    (100007, "a" * 400, "en", "src4", 400),
]


@pytest.fixture(scope="module")
def edge_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 with documents replaced by documents ∪ EDGE_ROWS; every
    other table copied verbatim so multi-table plans still resolve."""
    out = tmp_path_factory.mktemp("edge_sf")
    for t in TABLES:
        src = pathlib.Path(sf_dir) / f"{t}.parquet"
        if t != "documents" and src.exists():
            dest = out / f"{t}.parquet"
            if src.is_dir():
                shutil.copytree(src, dest)
            else:
                shutil.copy(src, dest)
    # single-FILE parquet, like the generated fixtures — both readers
    # (spark.read.parquet and duckdb read_parquet) take the same path
    import duckdb

    con = duckdb.connect()
    values = ", ".join(
        "("
        + ", ".join(
            "NULL"
            if v is None
            else (str(v) if isinstance(v, int) else "'" + v.replace("'", "''") + "'")
            for v in row
        )
        + ")"
        for row in EDGE_ROWS
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
          UNION ALL
          SELECT * FROM (VALUES {values})
            t(doc_id, text, lang, source, n_chars)
        ) TO '{out / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb_connection(edge_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", _doc_only_queries())
def test_doc_only_query_matches_oracle_on_edge_corpus(spark, edge_dir, edge_con, name):
    result = compare(QUERIES[name](spark, edge_dir), edge_con, ORACLE_SQL[name])
    assert result["count_match"], (name, result)
    assert result["schema_match"], (name, result)
    assert result["value_match"], {
        k: v for k, v in result.items() if k != "first_diffs"
    } | {"first_diffs": result.get("first_diffs")}
