"""PPJoin candidate-count telemetry for ``dedup_prefix_jaccard``'s stress
ratio (VERDICT r8 item 2: "diagnose, don't assume").

    python tools/diag_ppjoin.py [one_dir] [ten_dir]

Counts, at 1× and 10× (default: sf0.1 vs the docs2 stress replica in
/tmp), every stage of the prefix-filter funnel: docs, shingle rows,
DISTINCT shingles, prefix-join tuples (pre-filter), and candidates
surviving the canonical/length/positional filters. These are
deterministic functions of the data — if the code is untouched and the
replica identical, the counts CANNOT drift; only the wall can.

Round-9 reading (recorded in the round log): the synthetic replica is
vocabulary-SATURATED (distinct shingles ×1.08 at rows ×10), so prefix
lists grow linearly with the corpus and candidate volume grows
quadratically BY REPLICA CONSTRUCTION — measured ×117 join tuples /
×145 candidates at rows ×10. The wall ratio stays ~4× only because
per-candidate verification is row-local codegen (the operator docstring's
documented worst regime). A ratio drifting 3.5→5.9→4.1 across rounds on
identical counts is therefore measurement noise (sweep pressure over an
overhead-dominated 1× base), not plan growth; real text (growing
vocabulary) never enters this regime.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def funnel_counts(spark, sf_dir: str, threshold: float = 0.5) -> dict:
    """Replay prefix_jaccard_join's candidate funnel (same expressions,
    operators/dedup.py:prefix_jaccard_join) and count each stage."""
    from scala_etl_test_spark.caching import release_persisted, tracked_persist
    from scala_etl_test_spark.operators.dedup import shingle_table

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sh = shingle_table(docs, "text", "doc_id", 3).transform(tracked_persist)
    out = {
        "docs": docs.count(),
        "shingle_rows": sh.count(),
        "distinct_shingles": sh.select("sh_h").distinct().count(),
    }
    sh2 = sh.select(F.col("doc_id"), "sh_h")
    freq = sh2.groupBy("sh_h").agg(F.count(F.lit(1)).alias("_freq"))
    per_doc = (
        sh2.join(freq, on="sh_h")
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("_freq"), F.col("sh_h")))).alias(
                "_sorted"
            )
        )
    )
    eps, t = 1e-9, float(threshold)
    n = F.size("_sorted")
    probe_len = (n - F.ceil(F.lit(t) * n - F.lit(eps)) + 1).cast("int")
    entries = per_doc.select(
        F.col("doc_id"),
        n.alias("_n"),
        F.posexplode(F.slice("_sorted", 1, probe_len)).alias("_pos", "_p"),
    ).select("doc_id", "_n", "_pos", F.col("_p.sh_h").alias("sh_h"))
    idx_c = 2.0 * t / (1.0 + t)
    index_len = F.col("_n") - F.ceil(F.lit(idx_c) * F.col("_n") - F.lit(eps)) + 1
    a = entries.filter(F.col("_pos") < index_len).select(
        F.col("doc_id").alias("id_a"),
        F.col("_n").alias("n_a"),
        F.col("_pos").alias("pos_a"),
        "sh_h",
    )
    b = entries.select(
        F.col("doc_id").alias("id_b"),
        F.col("_n").alias("n_b"),
        F.col("_pos").alias("pos_b"),
        "sh_h",
    )
    canonical = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("id_a") < F.col("id_b"))
    )
    length_ok = F.col("n_a") >= F.ceil(F.lit(t) * F.col("n_b") - F.lit(eps))
    req = F.ceil(F.lit(t / (1.0 + t)) * (F.col("n_a") + F.col("n_b")) - F.lit(eps))
    ub = F.lit(1) + F.least(
        F.col("n_a") - F.col("pos_a") - 1, F.col("n_b") - F.col("pos_b") - 1
    )
    joined = a.join(b, on="sh_h")
    out["prefix_join_tuples"] = joined.count()
    out["candidates_after_filters"] = (
        joined.filter(canonical & length_ok & (ub >= req))
        .select(F.least("id_a", "id_b"), F.greatest("id_a", "id_b"))
        .distinct()
        .count()
    )
    release_persisted()
    spark.catalog.clearCache()
    return out


def main() -> None:
    from scala_etl_test_spark.session import build_session

    one_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ten_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress10x_docs2"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    one = funnel_counts(spark, one_dir)
    ten = funnel_counts(spark, ten_dir)
    print(
        json.dumps(
            {
                "metric": "ppjoin_candidate_funnel",
                "1x": one,
                "10x": ten,
                "growth": {k: round(ten[k] / one[k], 2) for k in one if one[k]},
            }
        )
    )


if __name__ == "__main__":
    main()
