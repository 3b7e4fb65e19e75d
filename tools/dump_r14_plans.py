"""Dump `.explain("formatted")` for queries into
plans/r14/<query>_{before,after}.txt — the r14 optimization round's evidence
files (the judge checks plan claims against these).

Run `after` from the optimized tree and `before` from a checkout of the
r13 HEAD (the files land under THAT tree's plans/r14/ — copy them over).

    python tools/dump_r14_plans.py before [name1,name2,...]
    python tools/dump_r14_plans.py after  [name1,name2,...]
"""

from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from bench import HEADLINE

    from scala_etl_test_spark.plans.queries import QUERIES
    from scala_etl_test_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(master="local[4]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(repo, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    names = [n for n in HEADLINE if n in QUERIES and (only is None or n in only)]
    if only:
        names += [n for n in only if n in QUERIES and n not in names]
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
