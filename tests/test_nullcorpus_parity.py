"""Edge-corpus parity sweep (r12): registry queries whose oracle reads ONLY
one augmentable table, value-hash-compared across engines over sf0.001
AUGMENTED with the edge rows the generated fixtures never contain — NULL
text / NULL lang / NULL source, empty and whitespace-only strings,
multi-byte unicode, a 'BM' image-signature prefix, pathological token
shapes (documents); NULL timestamps / users / types / values, malformed
props JSON, epoch and far-future timestamps, negative and NaN values,
exact timestamp ties (events). The r12 multimodal and text/dedup NULL
fixes were all latent divergences exactly this class of row exposes;
this sweep pins both families against the next one. Self-maintaining:
the query lists are derived from ORACLE_SQL table references, so new
single-table queries join the sweep automatically."""

from __future__ import annotations

import pathlib
import re
import shutil

import pytest

from scala_etl_test_spark.plans.queries import ORACLE_SQL, QUERIES

from tests.oracle_harness import TABLES, compare, duckdb_connection


def _single_table_queries(table: str) -> list[str]:
    names = []
    for name, sql in ORACLE_SQL.items():
        used = {t for t in TABLES if re.search(rf"\b{t}\b", sql)}
        if used == {table}:
            names.append(name)
    return sorted(names)


EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars) — ids far above the fixture max
    (100000, None, None, "'src0'", None),
    (100001, "''", "'en'", "'src1'", 0),
    (100002, "'BM short image-signature prose'", "'en'", "'web'", 30),
    (
        100003,
        "'múltí-byte ünïcôde — high nibbles differ from ASCII ©'",
        "'de'",
        "'books'",
        53,
    ),
    (100004, "' \t  \n '", None, "'src2'", 6),
    (100005, "'x'", "'en'", None, 1),
    (100006, "'the the the the the the the the'", "'en'", "'src3'", 31),
    (100007, "'" + "a" * 400 + "'", "'en'", "'src4'", 400),
]

_TS = "TIMESTAMP '{}'"
EDGE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (100000, None, 7, "'error'", "1.0", "'{\"k\": 1}'"),
    (100001, _TS.format("2024-01-02 00:00:00"), None, "'purchase'", "2.0", "'{\"k\": 2}'"),
    (100002, _TS.format("2024-01-02 00:01:00"), 7, None, "3.0", None),
    (100003, _TS.format("2024-01-02 00:02:00"), 7, "'purchase'", None, "'{broken json'"),
    (100004, _TS.format("1970-01-01 00:00:00"), 8, "'signup'", "-5.0", "'{\"k\": -3}'"),
    (100005, _TS.format("2030-12-31 23:59:59"), 8, "'error'", "0.0", "'{}'"),
    # exact ts tie with 100003, same user: an under-determined ordering
    # (row_number over ts alone) diverges here — that IS a defect per the
    # repo's pinned-tie-break standard
    (100006, _TS.format("2024-01-02 00:02:00"), 7, "'purchase'", "4.0", "'{\"k\": 99}'"),
]

# NaN `value` is deliberately NOT in the sweep: the ENGINE survives it
# (test_events_engine_survives_nan_values below executes the quantizing
# queries over a NaN row), but several DuckDB oracles crash replaying a
# NaN→int cast — an oracle-replayability limit, not an engine defect.
# Production policy: quarantine NaN metrics at ingest (expectations
# operator); parity over NaN aggregation semantics is out of contract.
_NAN_EVENT = (100007, _TS.format("2024-01-02 00:03:00"), 9, "'view'", "CAST('NaN' AS DOUBLE)", "'{\"k\": 5}'")


def _values_sql(rows: list[tuple]) -> str:
    """Rows are pre-encoded SQL fragments (quoted strings / typed literals /
    ints / None) — emit a VALUES list."""
    return ", ".join(
        "(" + ", ".join("NULL" if v is None else str(v) for v in row) + ")"
        for row in rows
    )


@pytest.fixture(scope="module")
def edge_dir(sf_dir, tmp_path_factory):
    """sf0.001 with documents AND events augmented by their edge rows;
    every other table copied verbatim so multi-table plans still resolve.
    Single-FILE parquet via DuckDB COPY — both engines read the same
    path, like the generated fixtures."""
    import duckdb

    out = tmp_path_factory.mktemp("edge_sf")
    augmented = {
        "documents": (EDGE_DOCS, "t(doc_id, text, lang, source, n_chars)"),
        "events": (EDGE_EVENTS, "t(event_id, ts, user_id, event_type, value, props)"),
    }
    con = duckdb.connect()
    for t in TABLES:
        src = pathlib.Path(sf_dir) / f"{t}.parquet"
        if not src.exists():
            continue
        if t in augmented:
            rows, alias = augmented[t]
            con.execute(
                f"""
                COPY (
                  SELECT * FROM read_parquet('{src}')
                  UNION ALL
                  SELECT * FROM (VALUES {_values_sql(rows)}) {alias}
                ) TO '{out / (t + ".parquet")}' (FORMAT PARQUET)
                """
            )
        else:
            shutil.copy(src, out / f"{t}.parquet")
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb_connection(edge_dir)
    yield con
    con.close()


def _check(spark, edge_dir, edge_con, name):
    result = compare(QUERIES[name](spark, edge_dir), edge_con, ORACLE_SQL[name])
    assert result["count_match"], (name, result)
    assert result["schema_match"], (name, result)
    assert result["value_match"], {
        k: v for k, v in result.items() if k != "first_diffs"
    } | {"first_diffs": result.get("first_diffs")}


@pytest.mark.parametrize("name", _single_table_queries("documents"))
def test_doc_only_query_matches_oracle_on_edge_corpus(spark, edge_dir, edge_con, name):
    _check(spark, edge_dir, edge_con, name)


@pytest.mark.parametrize("name", _single_table_queries("events"))
def test_events_only_query_matches_oracle_on_edge_corpus(spark, edge_dir, edge_con, name):
    _check(spark, edge_dir, edge_con, name)


def test_events_engine_survives_nan_values(spark, sf_dir, tmp_path):
    """Engine-robustness pin for the row class the parity sweep excludes:
    a NaN metric value must not kill any of the value-quantizing event
    queries (their DuckDB oracles cannot replay NaN→int casts, but the
    Spark plans must still execute — at 100 TB a NaN from a bad upstream
    is a certainty, and the answer is quarantine, not a dead executor)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{sf_dir}/events.parquet')
          UNION ALL
          SELECT * FROM (VALUES {_values_sql([_NAN_EVENT])})
            t(event_id, ts, user_id, event_type, value, props)
        ) TO '{tmp_path}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for t in TABLES:
        src = pathlib.Path(sf_dir) / f"{t}.parquet"
        if t != "events" and src.exists():
            shutil.copy(src, tmp_path / f"{t}.parquet")
    for name in (
        "events_hourly_rollup",
        "window_moving_avg",
        "events_gapfill",
        "quantile_sketch_merge",
        "events_trimmed_stats",
    ):
        assert QUERIES[name](spark, str(tmp_path)).count() >= 0, name


def test_embeddings_engine_survives_null_and_empty_vectors(spark, sf_dir, tmp_path):
    """Engine-robustness pin for the embeddings family: NULL and
    zero-length embedding rows must not kill any of the ANN / covariance
    / clustering queries (quantized_base's documented NULL/empty filter
    plus the cosine NULL semantics absorb them). Parity is not asserted
    here — the vector oracles hardcode width arithmetic — only that the
    plans execute; at 100 TB a NULL vector from a failed embed job is a
    certainty, and the answer is quarantine, not a dead executor."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')
          UNION ALL
          SELECT * FROM (VALUES
            (900000, NULL, 0),
            (900001, CAST([] AS FLOAT[]), 1)
          ) t(vec_id, embedding, label)
        ) TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    for t in TABLES:
        src = pathlib.Path(sf_dir) / f"{t}.parquet"
        if t != "embeddings" and src.exists():
            shutil.copy(src, tmp_path / f"{t}.parquet")
    for name in (
        "ann_cosine_topk",
        "ann_ivf_topk",
        "ann_lsh_topk",
        "embedding_covariance",
        "embedding_near_dup",
        "semantic_dedup",
        "embedding_centroids",
        "kmeans_train",
        "ann_pq_topk",
    ):
        assert QUERIES[name](spark, str(tmp_path)).count() >= 0, name
