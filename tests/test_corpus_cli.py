"""Corpus CLI smoke: all three artifacts written, internally consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from scala_etl_test_spark.corpus_cli import main


def test_corpus_cli_artifacts(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    main(["--data", sf_dir, "--out", out])
    assert "clean=" in capsys.readouterr().out

    clusters = spark.read.parquet(f"{out}/dedup_clusters")
    clean = spark.read.parquet(f"{out}/corpus_clean")
    splits = spark.read.parquet(f"{out}/splits")

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert splits.count() == n_docs
    assert set(splits.columns) == {"doc_id", "split"}
    assert clean.count() <= n_docs
    assert set(clean.columns) == {"doc_id", "predicted_lang", "quality_score", "re_tokens"}
    # no cluster loser survives in the clean corpus
    losers = clusters.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    assert clean.join(losers, "doc_id").count() == 0
    # a near-dup cluster never straddles splits
    straddling = (
        clusters.join(splits, clusters.node == splits.doc_id)
        .groupBy("component")
        .agg(F.count_distinct("split").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert straddling.count() == 0
    # mixture weights: one row per source, weights sum to 1
    mixture = spark.read.parquet(f"{out}/mixture")
    n_sources = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("source").distinct().count()
    )
    assert mixture.count() == n_sources
    assert abs(sum(r["weight"] for r in mixture.collect()) - 1.0) < 1e-6


def test_corpus_cli_pii_and_repetition_flags(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    out = str(tmp_path / "corpus2")
    main([
        "--data", sf_dir, "--out", out,
        "--redact-pii", "--max-top-ngram-frac", "0.25",
    ])
    clean = spark.read.parquet(f"{out}/corpus_clean")
    assert {"redacted_text", "n_email", "n_phone", "n_ipv4"} <= set(clean.columns)
    # the synthetic corpus carries no PII: counts all zero, text unchanged
    assert clean.filter(F.col("n_email") + F.col("n_phone") + F.col("n_ipv4") > 0).count() == 0
    # the repetition gate is strictly more restrictive than the default run
    base = str(tmp_path / "corpus_base")
    main(["--data", sf_dir, "--out", base])
    assert clean.count() <= spark.read.parquet(f"{base}/corpus_clean").count()


def test_corpus_cli_tokenizer_stage(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_tok")
    main([
        "--data", sf_dir, "--out", out,
        "--tokenizer-merges", "4", "--pack-budget", "128",
    ])
    merges = spark.read.parquet(f"{out}/tokenizer/merges")
    assert merges.count() == 4
    tokens = spark.read.parquet(f"{out}/tokenizer/tokens")
    clean_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/corpus_clean").select("doc_id").collect()
    }
    tok_ids = {r["doc_id"] for r in tokens.select("doc_id").distinct().collect()}
    assert tok_ids == clean_ids  # only the clean corpus is encoded
    # concatenating a word's tokens reconstructs the word for a sample doc
    some = tokens.filter(F.col("doc_id") == min(tok_ids)).orderBy("pos", "tok_idx").collect()
    word0 = "".join(r["token"] for r in some if r["pos"] == 0)
    assert word0.isalnum() and len(word0) >= 1
    packed = spark.read.parquet(f"{out}/tokenizer/packed")
    assert {"doc_id", "split", "n_tokens", "pack_id", "pack_offset"} <= set(packed.columns)
    # every encoded doc is packed, offsets stay inside the budget
    assert packed.count() == len(tok_ids)
    assert packed.filter(F.col("pack_offset") >= 128).count() == 0


def test_corpus_cli_release_report(spark, sf_dir, tmp_path):
    out = str(tmp_path / "corpus_rel")
    main(["--data", sf_dir, "--out", out, "--release-report"])
    rep = {r["check"]: r for r in spark.read.parquet(f"{out}/release_report").collect()}
    assert set(rep) == {
        "exact_dup_rate",
        "quality_retention_at_075",
        "oov_token_rate_max",
        "cross_source_jaccard_max",
        "split_leakage_pairs",
    }
    for r in rep.values():
        assert r["value"] is not None and isinstance(r["passed"], bool)
    # the shipped split artifact is leakage-safe by construction — the
    # self-audit gate must report exactly zero straddled pairs AND pass
    assert rep["split_leakage_pairs"]["value"] == 0.0
    assert rep["split_leakage_pairs"]["passed"] is True
    # the document-corpus slice must agree with the registered gate query
    from scala_etl_test_spark.plans.queries import QUERIES

    full = {
        r["check"]: (r["value"], r["passed"])
        for r in QUERIES["corpus_release_report"](spark, sf_dir).collect()
    }
    for name, row in rep.items():
        if name == "split_leakage_pairs":
            continue  # CLI-only gate: audits this run's own split artifact
        assert full[name] == (row["value"], row["passed"]), name


def test_corpus_cli_forget_ids_erases_closure_everywhere(spark, sf_dir, tmp_path):
    """--forget-ids: the opt-outs AND their whole near-dup clusters are
    absent from EVERY artifact (corpus_clean, splits, mixture inputs) —
    including cluster representatives that plain dedup would have kept."""
    optout_ids = [0, 97, 194, 291, 388]
    optout_path = str(tmp_path / "optout")
    spark.createDataFrame([(i,) for i in optout_ids], "doc_id long").write.parquet(optout_path)

    out = str(tmp_path / "corpus_forget")
    main(["--data", sf_dir, "--out", out, "--forget-ids", optout_path])

    clusters = spark.read.parquet(f"{out}/dedup_clusters")
    clean = spark.read.parquet(f"{out}/corpus_clean")
    splits = spark.read.parquet(f"{out}/splits")

    comp_of = {r["node"]: r["component"] for r in clusters.collect()}
    doomed_comps = {comp_of[i] for i in optout_ids if i in comp_of}
    forgotten = set(optout_ids) | {
        n for n, c in comp_of.items() if c in doomed_comps
    }
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    split_ids = {r["doc_id"] for r in splits.select("doc_id").collect()}
    assert not (clean_ids & forgotten), sorted(clean_ids & forgotten)
    assert not (split_ids & forgotten), sorted(split_ids & forgotten)
    # and the erasure is minimal: everything outside the closure still has
    # a split assignment
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(split_ids) == n_docs - len(forgotten)


def test_corpus_cli_ann_index_artifact_and_forget_composition(spark, sf_dir, tmp_path):
    """--ann-index: the vector index is a first-class derived artifact —
    partitioned by cluster_id (probe = partition pruning), covering exactly
    the CLEAN corpus's embeddings, and a --forget-ids closure is absent
    from it by construction."""
    import os
    import re

    optout_ids = [0, 97]
    optout_path = str(tmp_path / "optout")
    spark.createDataFrame([(i,) for i in optout_ids], "doc_id long").write.parquet(optout_path)
    out = str(tmp_path / "corpus_ann")
    main(["--data", sf_dir, "--out", out, "--ann-index", "4", "--forget-ids", optout_path])

    from scala_etl_test_spark.streaming.ann import ivf_index_topk, read_ivf_corpus

    idx = f"{out}/ann_index"
    corpus = read_ivf_corpus(spark, idx)
    clean_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/corpus_clean").select("doc_id").collect()
    }
    emb_ids = {
        r["vec_id"]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id").collect()
    }
    got = {r["vec_id"] for r in corpus.select("vec_id").collect()}
    assert got == (clean_ids & emb_ids), "index must cover exactly the clean corpus"
    assert not (got & set(optout_ids))
    # physical layout: cluster_id dirs on disk; a probe is partition pruning
    cells = [d for d in os.listdir(f"{idx}/corpus") if d.startswith("cluster_id=")]
    assert 1 <= len(cells) <= 4
    qv = [
        float(v)
        for v in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id").limit(1).first()["embedding"]
    ]
    hits = ivf_index_topk(spark, idx, qv, k=10, nprobe=2)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cluster_id", plan), plan
    assert {r["vec_id"] for r in hits.collect()} <= got


def test_corpus_cli_prev_release_diff(spark, sf_dir, tmp_path):
    """--prev-release: the second run ships a per-doc diff against the
    first run's corpus_clean. A stricter quality gate makes some docs
    'removed'; identical survivors stay 'unchanged'; nothing is 'added'
    or 'changed' (same data, same metrics)."""
    from scala_etl_test_spark.corpus_cli import main

    out1, out2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    main(["--data", sf_dir, "--out", out1])
    main([
        "--data", sf_dir, "--out", out2,
        "--min-quality", "0.9", "--prev-release", out1,
    ])
    diff = spark.read.parquet(f"{out2}/release_diff")
    got = {r["status"]: r["n"] for r in diff.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n1 = spark.read.parquet(f"{out1}/corpus_clean").count()
    n2 = spark.read.parquet(f"{out2}/corpus_clean").count()
    assert got.get("removed", 0) == n1 - n2 > 0
    assert got.get("unchanged", 0) == n2
    assert "added" not in got and "changed" not in got
    assert diff.count() == n1


def test_corpus_cli_pq_rotation_eval_artifact(spark, sf_dir, tmp_path):
    """--pq-rotation-eval: the eigh-based PCA rotation A/B (the
    non-SQL-replayable twin of the registered pq_rotation_recall query)
    ships as a 4-row artifact with the same shape and invariants."""
    out = str(tmp_path / "corpus_rot")
    main(["--data", sf_dir, "--out", out, "--pq-rotation-eval"])

    rows = [tuple(r) for r in spark.read.parquet(f"{out}/pq_rotation_eval")
            .orderBy("variant", "path").collect()]
    assert [(r[0], r[1]) for r in rows] == [
        ("raw", "adc"), ("raw", "ivfpq"), ("rotated", "adc"), ("rotated", "ivfpq"),
    ]
    by_key = {}
    for variant, path, k, n_hits, recall in rows:
        assert k == 10 and 0 <= n_hits <= k and recall == round(n_hits / k, 6)
        by_key[(variant, path)] = n_hits
    # probing can only LOSE hits vs the full ADC scan of the same codes
    for variant in ("raw", "rotated"):
        assert by_key[(variant, "ivfpq")] <= by_key[(variant, "adc")]


def test_corpus_cli_pq_rotation_eval_requires_embeddings(tmp_path, sf_dir):
    """The embeddings precondition fails BEFORE any pipeline work."""
    import shutil

    import pytest

    data = str(tmp_path / "docs_only")
    (tmp_path / "docs_only").mkdir()
    shutil.copy(f"{sf_dir}/documents.parquet", f"{data}/documents.parquet")
    with pytest.raises(SystemExit, match="pq-rotation-eval requires"):
        main(["--data", data, "--out", str(tmp_path / "o"), "--pq-rotation-eval"])
