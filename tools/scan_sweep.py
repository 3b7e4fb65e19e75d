"""Repeated-scan sweep: flag registered queries whose executed plan scans
the same parquet table more than once.

    python tools/scan_sweep.py [sf_dir]

Multi-granularity aggregates legitimately rescan (documented per query);
everything else is a candidate for the window/stack/persist treatments
(see tpch_q20, expect_orders, events_funnel commit history — all three
were repeated-scan findings from this sweep). Counts use
``simpleString()``; note that cached subtrees print their child FileScan
text, so verify suspicious counts against ``InMemoryTableScan`` presence
before calling them regressions.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from scala_etl_test_spark.plans.queries import QUERIES
    from scala_etl_test_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    pat = re.compile(rf"FileScan parquet.*?/{re.escape(sf_name)}/(\w+)\.parquet")
    for name, fn in QUERIES.items():
        s = fn(spark, sf_dir)._jdf.queryExecution().simpleString()
        repeats = {t: n for t, n in Counter(pat.findall(s)).items() if n > 1}
        if repeats:
            cached = s.count("InMemoryTableScan")
            print(f"{name}: {repeats}" + (f"  (cached subtrees: {cached})" if cached else ""))
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
