"""Local replica of the driver's DuckDB-oracle compare: row count, column
names, and order-insensitive value equality between a Spark DataFrame and an
oracle SQL result over the same parquet tables."""

from __future__ import annotations

import math
import time

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_cell(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 9)
        if isinstance(v, int):
            return float(v) if False else v
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    t_oracle = time.perf_counter()
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()
    oracle_s = time.perf_counter() - t_oracle

    result = {
        "oracle_s": oracle_s,
        "rows_spark": len(spark_rows),
        "rows_duck": len(duck_rows),
        "cols_spark": sorted(spark_cols),
        "cols_duck": sorted(duck_cols),
        "count_match": len(spark_rows) == len(duck_rows),
        "schema_match": sorted(spark_cols) == sorted(duck_cols),
    }
    if result["count_match"] and result["schema_match"]:
        ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
        result["value_match"] = ns == nd
        if not result["value_match"]:
            diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
            result["first_diffs"] = diffs[:5]
    else:
        result["value_match"] = False
    return result
