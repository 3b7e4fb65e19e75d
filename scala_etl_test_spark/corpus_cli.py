"""Training-data corpus CLI (beyond-reference).

Runs the corpus-curation pipeline over a directory of parquet tables
(``documents.parquet`` required, ``embeddings.parquet`` optional) and writes
one parquet table per artifact:

    python -m scala_etl_test_spark.corpus_cli --data <dir> --out <dir> \
        [--split train=0.8,val=0.1,test=0.1] [--min-quality 0.5] \
        [--redact-pii] [--max-top-ngram-frac 0.3] [--forget-ids <parquet>]

Artifacts:
- ``corpus_clean/``   — deduplicated + quality-gated docs with lang/quality/
                        tokens (+ PII-redacted text and counts with
                        ``--redact-pii``; repetition-gated with
                        ``--max-top-ngram-frac``)
- ``dedup_clusters/`` — (node, component) near-duplicate cluster map
- ``splits/``         — leakage-safe train/val/test assignment (clusters
                        never straddle a split)
- ``mixture/``        — √-temperature sampling weight per source (the
                        data-mixing knob for multi-source training)
- with ``--tokenizer-merges K``: ``tokenizer/merges/`` (the trained BPE
  merge table), ``tokenizer/tokens/`` (the CLEAN corpus encoded to
  subword tokens), ``tokenizer/packed/`` (tokens greedily packed into
  fixed-budget training sequences) — the train → encode → pack last mile.
- with ``--pq-rotation-eval``: ``pq_rotation_eval/`` — the eigh-based PCA
  rotation-vs-raw PQ/IVF-PQ recall A/B (4 rows), the non-SQL-replayable
  twin of the registered pq_rotation_recall query.
- with ``--prev-release <out_dir>``: ``release_diff/`` — per-doc
  added/removed/changed/unchanged vs that run's ``corpus_clean``
  (operators/integrity.py:snapshot_diff), the release note consumers
  audit before re-ingesting a new corpus version.
"""

from __future__ import annotations

import argparse


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, frac = part.partition("=")
        if not frac:
            raise SystemExit(f"bad --split component {part!r} (want name=fraction)")
        out[name.strip()] = float(frac)
    return out


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="scala-etl-test-spark-corpus")
    parser.add_argument("--data", required=True, help="dir containing documents.parquet")
    parser.add_argument("--out", required=True, help="output dir (one subdir per artifact)")
    parser.add_argument("--split", default="train=0.8,val=0.1,test=0.1")
    parser.add_argument("--min-quality", type=float, default=0.5)
    parser.add_argument(
        "--redact-pii",
        action="store_true",
        help="add redacted_text + per-class PII counts to corpus_clean",
    )
    parser.add_argument(
        "--max-top-ngram-frac",
        type=float,
        default=None,
        help="drop docs whose top unigram (or bigram) holds more than this "
        "fraction of the doc (Gopher-style repetition gate)",
    )
    parser.add_argument(
        "--tokenizer-merges",
        type=int,
        default=None,
        metavar="K",
        help="train a K-merge BPE tokenizer on the clean corpus, encode it, "
        "and pack the tokens into fixed-budget sequences",
    )
    parser.add_argument(
        "--pack-budget",
        type=int,
        default=256,
        help="tokens per packed training sequence (with --tokenizer-merges)",
    )
    parser.add_argument(
        "--release-report",
        action="store_true",
        help="write the document-corpus governance gates (dup rate, quality "
        "retention, OOV, cross-source leakage, split leakage) to "
        "{out}/release_report",
    )
    parser.add_argument(
        "--ann-index",
        type=int,
        default=None,
        metavar="K",
        help="build the IVF ANN index artifact ({out}/ann_index: frozen "
        "K-centroid sidecar + corpus partitioned by cluster_id) over the "
        "embeddings of the CLEAN corpus — requires embeddings.parquet "
        "(vec_id aligned with doc_id)",
    )
    parser.add_argument(
        "--pq-rotation-eval",
        action="store_true",
        help="write the eigh-based PCA rotation-vs-raw PQ/IVF-PQ recall A/B "
        "({out}/pq_rotation_eval, 4 rows) over embeddings.parquet — the "
        "non-SQL-replayable twin of the registered pq_rotation_recall "
        "query, which uses the variance round-robin permutation",
    )
    parser.add_argument(
        "--prev-release",
        default=None,
        metavar="OUT_DIR",
        help="a previous run's --out dir: diff this run's corpus_clean "
        "against its corpus_clean (operators/integrity.py:snapshot_diff) "
        "and write the per-doc added/removed/changed/unchanged map to "
        "{out}/release_diff — the release note consumers audit before "
        "re-ingesting",
    )
    parser.add_argument(
        "--forget-ids",
        default=None,
        metavar="PARQUET",
        help="parquet path with a doc_id column: erase these documents AND "
        "every member of their near-dup clusters (content closure) from "
        "every artifact — corpus_clean, splits, mixture, tokenizer, and "
        "(with --ann-index) the vector index",
    )
    args = parser.parse_args(argv)

    if args.ann_index is not None or args.pq_rotation_eval:
        # validate BEFORE the pipeline runs: failing K<1 or a missing
        # embeddings table after hours of dedup/CC/splits work is the worst
        # possible place (r9 review finding #7)
        import os as _os

        if args.ann_index is not None and args.ann_index < 1:
            raise SystemExit("--ann-index must be >= 1")
        if not _os.path.exists(f"{args.data}/embeddings.parquet"):
            flag = "--ann-index" if args.ann_index is not None else "--pq-rotation-eval"
            raise SystemExit(
                f"{flag} requires {args.data}/embeddings.parquet (vec_id "
                "aligned with doc_id); not found"
            )

    from pyspark.sql import functions as F

    from scala_etl_test_spark.operators import text as X
    from scala_etl_test_spark.operators.cluster import connected_components
    from scala_etl_test_spark.operators.sampling import leakage_safe_split, mixture_weights
    from scala_etl_test_spark.plans.queries_data import q_dedup_minhash_pairs
    from scala_etl_test_spark.session import build_session
    from scala_etl_test_spark.sources.parquet_source import read_table

    weights = _parse_weights(args.split)
    spark = build_session()
    docs = read_table(spark, args.data, "documents")

    pairs = q_dedup_minhash_pairs(spark, args.data).persist()
    comp = connected_components(pairs)
    comp.write.mode("overwrite").parquet(f"{args.out}/dedup_clusters")

    if args.forget_ids is not None:
        # erase BEFORE any artifact derives from the corpus: the opt-outs
        # and their whole near-dup clusters (content closure) must be
        # absent from corpus_clean, splits, mixture, and tokenizer alike.
        # Pairs were discovered over the FULL corpus first, so duplicates
        # of an opted-out doc are known and erased with it.
        from scala_etl_test_spark.operators.cluster import forget_documents

        optout = spark.read.parquet(args.forget_ids).select("doc_id")
        docs = forget_documents(docs, optout, pairs, components=comp)

    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = docs.join(losers, on="doc_id", how="left_anti")
    if args.max_top_ngram_frac is not None:
        rep = X.repetition_metrics(kept, "text", "doc_id")
        repetitive = rep.filter(
            (F.col("top_unigram_frac") > args.max_top_ngram_frac)
            | (F.coalesce("top_bigram_frac", F.lit(0.0)) > args.max_top_ngram_frac)
        ).select("doc_id")
        kept = kept.join(repetitive, on="doc_id", how="left_anti")
    cols = [
        F.col("doc_id"),
        X.lang_id("text").alias("predicted_lang"),
        X.quality_score("text").alias("quality_score"),
        X.re_token_count("text").alias("re_tokens"),
    ]
    if args.redact_pii:
        from scala_etl_test_spark.operators import pii as P

        cols += [P.redact_pii("text").alias("redacted_text")] + [
            P.pii_count("text", kind).alias(f"n_{kind}") for kind in P.PII_PATTERNS
        ]
    # persisted: consumed by the write, the final count, the mixture, and
    # (with --tokenizer-merges) the word counts + encode input — without it
    # the dedup anti-joins and text metrics re-execute per consumer
    clean = kept.select(*cols).filter(F.col("quality_score") >= args.min_quality).persist()
    clean.write.mode("overwrite").parquet(f"{args.out}/corpus_clean")

    if args.prev_release is not None:
        # diff the artifact just WRITTEN (read back on purpose — the diff
        # must describe what shipped, the release-report precedent) against
        # the previous release's corpus_clean, over the content columns the
        # two releases share (flag changes like --redact-pii add columns;
        # the diff then speaks to the common surface)
        from scala_etl_test_spark.operators.integrity import snapshot_diff

        prev = spark.read.parquet(f"{args.prev_release}/corpus_clean")
        cur = spark.read.parquet(f"{args.out}/corpus_clean")
        shared = sorted((set(prev.columns) & set(cur.columns)) - {"doc_id"})
        snapshot_diff(prev, cur, "doc_id", shared).write.mode("overwrite").parquet(
            f"{args.out}/release_diff"
        )

    # reuse the already-computed component map — CC is the most expensive
    # stage and leakage_safe_split would otherwise run it a second time
    splits = leakage_safe_split(
        docs, pairs, "doc_id", weights, components=comp
    ).select("doc_id", "split")
    splits.write.mode("overwrite").parquet(f"{args.out}/splits")
    # pairs stay persisted through --release-report: its split-leakage gate
    # re-reads them, and an unpersist here would re-run the whole minhash

    # mixture over the CLEAN corpus: weighting sources by their raw counts
    # would over-sample exactly the near-dup/low-quality mass just gated out
    clean_docs = docs.join(clean.select("doc_id"), on="doc_id")
    mixture_weights(clean_docs, "source").write.mode("overwrite").parquet(f"{args.out}/mixture")

    if args.tokenizer_merges is not None:
        if args.tokenizer_merges < 0:
            raise SystemExit("--tokenizer-merges must be >= 0")
        from scala_etl_test_spark.operators.bpe import (
            bpe_encode,
            bpe_merges,
            collect_merges,
        )
        from scala_etl_test_spark.operators.packing import pack_sequences

        if args.tokenizer_merges == 0:
            merges: list[tuple[str, str]] = []  # char-level tokens
            spark.createDataFrame(
                [], "step int, lhs string, rhs string, merged string, pair_count long"
            ).write.mode("overwrite").parquet(f"{args.out}/tokenizer/merges")
        else:
            wc = (
                clean_docs.select(F.explode(X.words(F.col("text"))).alias("word"))
                .filter(F.col("word") != "")
                .groupBy("word")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            merges_df = bpe_merges(wc, args.tokenizer_merges)
            merges_df.write.mode("overwrite").parquet(f"{args.out}/tokenizer/merges")
            merges = collect_merges(merges_df)
        tokens = bpe_encode(clean_docs, merges, "text", "doc_id")
        tokens.write.mode("overwrite").parquet(f"{args.out}/tokenizer/tokens")
        # read the just-written tokens back: counting on the lazy frame
        # would re-execute the whole encode lineage a second time
        counts = (
            spark.read.parquet(f"{args.out}/tokenizer/tokens")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"))
        )
        packed = pack_sequences(
            counts.join(splits, on="doc_id"),
            "n_tokens",
            "doc_id",
            "split",
            budget=args.pack_budget,
        )
        packed.write.mode("overwrite").parquet(f"{args.out}/tokenizer/packed")

    if args.ann_index is not None:
        # the vector index is a DERIVED artifact like any other: built from
        # the CLEAN corpus AFTER erasure/dedup/quality gating, so a
        # --forget-ids closure is absent from it by construction (a later
        # deletion request against an already-shipped index is
        # streaming/ann.forget_from_ivf_index's job). Cell-partitioned
        # layout ⇒ probes are partition pruning (plan-gated in tests).
        import shutil as _shutil

        from scala_etl_test_spark.streaming.ann import init_ivf_index

        emb = read_table(spark, args.data, "embeddings")
        live = emb.join(
            clean.select(F.col("doc_id").alias("vec_id")), on="vec_id", how="left_semi"
        )
        _shutil.rmtree(f"{args.out}/ann_index", ignore_errors=True)
        init_ivf_index(spark, f"{args.out}/ann_index", live, n_centroids=args.ann_index)

    if args.pq_rotation_eval:
        # evaluation artifact, not a corpus derivative: measured over the
        # FULL embeddings table (index-quality question: "should the next
        # index build enable the rotation?"), independent of this run's
        # quality/dedup gating
        from scala_etl_test_spark.plans.queries_data import pca_rotation_recall_report

        pca_rotation_recall_report(spark, args.data).write.mode("overwrite").parquet(
            f"{args.out}/pq_rotation_eval"
        )

    if args.release_report:
        # the document-corpus gates, from the SAME builder behind the
        # registered corpus_release_report query (events-based gates don't
        # apply to a documents-only pipeline run)
        from scala_etl_test_spark.operators.contamination import split_leakage_audit
        from scala_etl_test_spark.plans.queries_data import document_release_gates

        # fifth gate: audit the split artifact THIS RUN just shipped — the
        # assignment is leakage-safe by construction, so any straddled
        # near-dup pair here means the artifact on disk is not the one the
        # pipeline computed (read back from parquet on purpose)
        leak_gate = (
            split_leakage_audit(spark.read.parquet(f"{args.out}/splits"), pairs)
            .agg(F.coalesce(F.sum("n_pairs"), F.lit(0)).cast("double").alias("value"))
            .select(
                F.lit("split_leakage_pairs").alias("check"),
                F.round("value", 6).alias("value"),
                (F.col("value") == 0).alias("passed"),
            )
        )
        document_release_gates(docs).unionByName(leak_gate).orderBy("check").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/release_report")
    pairs.unpersist()

    n_docs, n_clean = docs.count(), clean.count()
    clean.unpersist()
    # drop operator-internal caches (shingle tables, oriented edges, …)
    # accumulated across the pipeline stages — see caching.py contract
    from scala_etl_test_spark.caching import release_persisted

    release_persisted()
    print(
        f"docs={n_docs} clusters={comp.select('component').distinct().count()} "
        f"clean={n_clean} ({n_clean / max(n_docs, 1):.1%}) -> {args.out}"
    )


if __name__ == "__main__":
    main()
