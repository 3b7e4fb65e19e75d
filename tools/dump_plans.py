"""Regenerate PLANS.md: formatted physical plans for representative queries,
annotated with the scale property each plan demonstrates.

    python tools/dump_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

SHOWCASE = [
    (
        "scan_filter_project",
        "Both predicates appear in PushedFilters; ReadSchema carries only the 4 referenced columns.",
    ),
    (
        "tpch_q1",
        "partial_* aggregates before the Exchange (map-side combine): shuffled bytes ∝ groups, not rows.",
    ),
    (
        "broadcast_left_join",
        "BroadcastHashJoin with the filtered dimension on the build side; no Exchange anywhere — the reference's products pipeline stays shuffle-free.",
    ),
    (
        "conditional_window_sum",
        "Four same-spec window sums collapse into ONE Window node over one Exchange.",
    ),
    (
        "dedup_exact",
        "Exactly one Exchange (on the md5 fingerprint, uniform → skew-free).",
    ),
    (
        "topk_docs_per_source",
        "WindowGroupLimit before the Exchange: per-partition partial top-k, so no group ever materializes fully.",
    ),
    (
        "semi_join_exists",
        "LeftSemi join: build side carries only the key, probe rows never duplicate.",
    ),
    (
        "events_rollup",
        "Expand feeds a single HashAggregate: leaf + subtotal + grand total in one shuffle.",
    ),
    (
        "tpch_q10",
        "Fact filtered at the scan, both dimensions broadcast, top-20 via TakeOrderedAndProject (k rows per partition, never a full sort).",
    ),
    (
        "tpch_q21",
        "ONE lineitem scan: the three per-order rollups (max ship date, supplier count, count-at-max) are same-spec Window nodes sharing a single Exchange — the naive multi-CTE formulation rescans the aggregate subtree three times.",
    ),
    (
        "tpch_q20",
        "Per-part total as a window SUM over the per-(part,supplier) aggregate: one fact scan, one lineage, no persist — the cached-table variant leaked storage into long-lived sessions.",
    ),
    (
        "decontaminate",
        "Benchmark side broadcasts; the raw corpus shingle stream reaches the join with NO pre-join exchange — only join hits (a tiny fraction of the corpus) are shuffled into the count-distinct aggregate.",
    ),
    (
        "pack_sequences",
        "ONE window over ONE scan: per-shard cumulative token offsets assign packs; every shard packs independently, so the plan parallelizes by shard count.",
    ),
    (
        "tokenize_docs",
        "The vocab (an aggregate with no source statistics) still broadcasts — AQE converts the join at runtime, so the exploded corpus side never shuffles for the id lookup.",
    ),
    (
        "corpus_prepare",
        "The whole dedup → quality-gate → packing pipeline as one composed plan: LSH candidate generation, keep-representative anti-join, row-local metrics, and the per-shard packing window share lineage — no intermediate materialization.",
    ),
    (
        "duplicate_spans",
        "Gram frequency via partial-aggregating groupBy (a hot boilerplate gram combines map-side, never one sort partition); the filtered ≥2-occurrence gram set broadcasts back onto the seed stream; island merge shares one doc_id shuffle — duplicated-substring detection with zero pair generation.",
    ),
    (
        "chunk_dedup",
        "The shared-segment side shrinks to boilerplate hashes only after the HAVING filter, so both the removal anti-join and the reassembly see it broadcast — the corpus side shuffles once for reassembly.",
    ),
    (
        "unigram_lm_score",
        "The corpus-fit frequency table is vocab-sized: Catalyst broadcasts both the total and the per-word model, so scoring is broadcast-join + one groupBy on doc_id — the token stream never shuffles for the lookup.",
    ),
    (
        "bm25_topk",
        "Zero shuffles before the top-k: per-document term frequencies are array expressions inside the scan projection, corpus stats reduce to ONE row (map-side combined) and re-enter as a 1-row broadcast, top-k is TakeOrderedAndProject.",
    ),
    (
        "graph_pagerank",
        "The cached edge list is never shuffled or sorted: per-iteration rank/degree weights are node-sized broadcasts, and each contribution aggregate partial-combines to at most one row per node per task before its exchange.",
    ),
    (
        "events_zorder",
        "The Morton key is a single unrolled shift/mask projection inside whole-stage codegen — multi-dimensional clustering costs key arithmetic plus the one range exchange any global sort pays.",
    ),
    (
        "bpe_merges",
        "After ONE corpus-sized shuffle to weighted word types, every merge iteration is vocabulary-sized: pair counting, greedy occurrence selection, and rewriting are higher-order array expressions, and the winning pair re-enters as a one-row broadcast.",
    ),
    (
        "forget_from_ivf",
        "The deletion path for the vector index: the request-sized closure broadcasts into the final LEFT ANTI against the assigned corpus — the corpus itself is scanned once, never shuffled; on the persisted partitionBy(cluster_id) layout the same anti-join becomes a cell-local rewrite (only touched partitions).",
    ),
    (
        "embedding_covariance",
        "Exact second moments with NO self-join: the d(d+1)/2 pair products are nested array transforms inside the scan projection (row-local, codegen), feeding one partial-combined (dim_i, dim_j) aggregate; the d-row first-moment table broadcasts back. All sums integer/decimal — the one double division happens on the exact numerator, so the plan is reproducible bit-for-bit under any partitioning.",
    ),
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    from scala_etl_test_spark.plans.queries import QUERIES
    from scala_etl_test_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = [
        "# PLANS — physical-plan showcase",
        "",
        "Formatted Catalyst plans for representative registry queries, with the",
        "scale property each one demonstrates. These same properties are",
        "*asserted* by `tests/test_plans.py`; this file is the human-readable",
        "evidence. Regenerate with `python tools/dump_plans.py > PLANS.md`.",
        "",
        "Plans are built at sf0.001 (plan shape is SF-independent; AQE may",
        "further improve them at runtime).",
        "",
    ]
    for name, why in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**What to look for:** {why}")
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    print("\n".join(out))


if __name__ == "__main__":
    sys.exit(main())
