"""Replica of the driver's CORRECTNESS gate: run every registry query at
sf0.01, compare against its oracle SQL via DuckDB, and report per-query wall
time — so a time-budgeted gate can be profiled and slow entries tuned.

Usage: python tools/gate_replica.py [sf_dir] [--only name1,name2]

Timing note: Spark execution happens lazily inside compare()'s collect, so
spark-side and oracle-side time cannot be separated exactly; we report
``total_s`` (build + compare, the number the driver's budget sees) and
``oracle_s`` (DuckDB execute + normalize, measured inside the harness) and
rank by ``total_s`` alone.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated query names (default: all registered)",
    )
    ns = ap.parse_args()
    only = set(ns.only.split(",")) if ns.only else None

    import __spark_entry__ as entry_mod
    from tests.oracle_harness import compare, duckdb_connection

    from scala_etl_test_spark.session import build_session

    spark = build_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(ns.sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            ap.error(f"unknown query names: {sorted(unknown)}")

    results: dict[str, dict] = {}
    t_all = time.perf_counter()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # isolation: several queries persist intermediates; without this the
        # replica accumulates every cache and later timings measure a
        # different memory regime than a fresh driver run
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        status = "ok"
        rows = None
        oracle_s = 0.0
        try:
            df = fn(spark, ns.sf_dir)
            sql = oracles.get(name)
            if sql is not None:
                res = compare(df, con, sql)
                oracle_s = res.get("oracle_s", 0.0)
                rows = res["rows_spark"]
                if not res["value_match"]:
                    status = "MISMATCH: " + json.dumps(
                        {k: v for k, v in res.items() if k != "first_diffs"}
                    ) + " " + str(res.get("first_diffs", ""))[:300]
            else:
                rows = df.count()
                status = "rows-only"
        except Exception as exc:  # noqa: BLE001 - gate must report, not die
            status = f"ERROR: {type(exc).__name__}: {exc}"
        total_s = time.perf_counter() - t0
        results[name] = {
            "status": status,
            "total_s": round(total_s, 2),
            "oracle_s": round(oracle_s, 2),
            "rows": rows,
        }
        print(
            f"{name:32s} {status[:60]:60s} total={total_s:6.2f}s oracle={oracle_s:5.2f}s rows={rows}",
            flush=True,
        )
    total = time.perf_counter() - t_all
    bad = {n: r for n, r in results.items() if r["status"] not in ("ok", "rows-only")}
    print(f"\nTOTAL {total:.1f}s for {len(results)} queries; {len(bad)} not-ok")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["total_s"])[:12]
    print("slowest:", json.dumps({n: r["total_s"] for n, r in slow}))
    if bad:
        print("BAD:", json.dumps(bad, indent=2))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
