"""Regenerate the registry-wide plan-shape baseline.

    python tools/plan_snapshot.py   # rewrites tests/plan_baseline.json

For every registered query, records the compile-time physical-plan shape
counts (parquet scans, shuffle exchanges, join strategies, windows,
Python-eval nodes) at the test fixture SF. ``tests/test_plan_baseline.py``
diffs live plans against this file, so ANY unintended plan regression —
a lost broadcast, a new shuffle, an extra scan — fails loudly even for
queries without a hand-written plan gate. Regenerate (and review the
diff!) when a plan change is intentional.
"""

from __future__ import annotations

import json
import os
import sys


def shape(qe) -> dict[str, int]:
    s = qe.simpleString()
    return {
        "file_scans": s.count("FileScan parquet"),
        "exchanges": s.count("Exchange hashpartitioning"),
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sort_merge_joins": s.count("SortMergeJoin"),
        "nested_loop_joins": s.count("BroadcastNestedLoopJoin"),
        "windows": s.count("Window ["),
        "python_eval": s.count("MapInPandas")
        + s.count("ArrowEvalPython")
        + s.count("FlatMapGroupsInPandas"),
        "cached": s.count("InMemoryTableScan"),
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    from scala_etl_test_spark.plans.queries import QUERIES
    from scala_etl_test_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    baseline = {}
    for name, fn in QUERIES.items():
        baseline[name] = shape(fn(spark, sf_dir)._jdf.queryExecution())
        spark.catalog.clearCache()
    out = os.path.join(repo, "tests", "plan_baseline.json")
    with open(out, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(baseline)} baselines -> {out}")


if __name__ == "__main__":
    main()
