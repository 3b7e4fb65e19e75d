"""Solo-time queries: warm once at sf0.001, then min-of-N at the target SF
with the noop sink. Prints one JSON line. For A/B runs, launch once per
code tree (the repo root is sys.path[0] = this file's parent's parent).

    python tools/solo_time.py q1,q2[,...] [n_runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def main() -> int:
    names = sys.argv[1].split(",")
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from scala_etl_test_spark.caching import release_persisted
    from scala_etl_test_spark.plans.queries import QUERIES
    from scala_etl_test_spark.session import build_session

    extra = json.loads(os.environ.get("SPARK_GRAFT_EXTRA_CONF", "{}"))
    spark = build_session(
        master=f"local[{cpus}]", shuffle_partitions=int(cpus), extra_conf=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        import urllib.request

        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    def cpu_now() -> float:
        """Total executorCpuTime (ns → s) across all completed stages so
        far — a contention-robust work metric (deltas around a run isolate
        it). CPU time, not executorRunTime wall: a stage blocked on fetch
        counts ~0 here."""
        try:
            return sum(s["executorCpuTime"] for s in rest("stages?status=complete")) / 1e9
        except Exception:
            return 0.0

    def run_once(name: str, d: str) -> tuple[float, float]:
        c0 = cpu_now()
        t0 = time.perf_counter()
        QUERIES[name](spark, d).write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        cpu = cpu_now() - c0
        release_persisted()
        spark.catalog.clearCache()
        return el, cpu

    warm = "/root/testdata/sf0.001"
    warm = warm if os.path.isdir(warm) else sf_dir
    out = {"repo": repo, "sf_dir": sf_dir, "runs": {}}
    for name in names:
        run_once(name, warm)
        run_once(name, sf_dir)  # target-SF warm (page cache, AQE stats)
        pairs = [run_once(name, sf_dir) for _ in range(n_runs)]
        walls = [round(w, 3) for w, _ in pairs]
        cpus_s = [round(c, 2) for _, c in pairs]
        out["runs"][name] = {
            "min": min(walls),
            "all": walls,
            "cpu_min": min(cpus_s),
            "cpu_all": cpus_s,
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
