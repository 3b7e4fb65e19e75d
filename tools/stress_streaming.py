"""10×-volume stress run for the STREAMING twins (VERDICT r6 item 8) — the
one tier ``tools/stress_replica.py`` doesn't sweep.

    python tools/stress_streaming.py [--twin dedup|cdc|all] [sf_dir] [out_dir]

Feeds TEN 1×-sized micro-batches (10× total volume by the final batch)
through each twin and prints one JSON line per twin with PER-BATCH wall
times from the streaming engine's own progress telemetry — the scale
signal is the per-batch TREND as accumulated state grows, not a 1×-vs-10×
total:

- **dedup** (incremental LSH, ``streaming/dedup.py``): batch N probes an
  index holding N-1 batches. The probe is an equi-join restricted to the
  buckets the batch touches, so per-batch wall must stay ~FLAT as the
  index grows 10× — a rising trend means the probe started scanning the
  corpus. Batches are per-replica word-shuffled documents (the verbatim-
  replication trap from stress_replica.py: verbatim copies make every doc
  a 10-way exact dup and the pair EXPLOSION, not the operator, dominates).
- **cdc** (two-generation upsert, ``streaming/cdc.py``): batch N merges
  into a state table holding N-1 batches' keys, and the merge REWRITES
  the state (full-outer against the generation file), so per-batch wall
  growing LINEARLY in state size is the documented design — the stress
  pins that it is at-most-linear (ratio last/first ≲ batches) and that
  state row counts match the exact expected key union per batch. At
  warehouse scale the rewrite narrows to changed partitions
  (operators/merge.py docstring); the harness measures the worst case.

Batch files get strictly ascending mtimes so maxFilesPerTrigger=1 yields
one file per micro-batch in replica order.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = 10


def _ascending_mtimes(paths: list[str]) -> None:
    base = time.time() - 3600
    for i, p in enumerate(sorted(paths)):
        os.utime(p, (base + i, base + i))


def _write_single_file(df, staging: str, dest: str) -> None:
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(
        f for f in os.listdir(staging) if f.startswith("part-") and f.endswith(".parquet")
    )
    shutil.copy(os.path.join(staging, part), dest)
    shutil.rmtree(staging, ignore_errors=True)


def _build_doc_batches(spark, sf_dir: str, src_dir: str) -> int:
    """One single-file parquet per replica: word-shuffled text, shifted ids
    (same shuffle discipline as stress_replica._build_docs_replica)."""
    from pyspark.sql import functions as F

    from scala_etl_test_spark.operators.dedup import words

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1
    os.makedirs(src_dir, exist_ok=True)
    for r in range(BATCHES):
        keyed = F.transform(
            words("text"),
            lambda w, i: F.struct(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(r)), F.col("doc_id").cast("string"), i.cast("string"), w
                    )
                ).alias("k"),
                w.alias("w"),
            ),
        )
        shuffled = F.array_join(F.transform(F.array_sort(keyed), lambda s: s["w"]), " ")
        batch = docs.withColumn("text", shuffled).withColumn(
            "doc_id", F.col("doc_id") + F.lit(r * max_id)
        )
        _write_single_file(batch, f"{src_dir}/_stage", f"{src_dir}/batch_{r:03d}.parquet")
    _ascending_mtimes(
        [os.path.join(src_dir, f) for f in os.listdir(src_dir) if f.endswith(".parquet")]
    )
    return BATCHES


def _build_event_batches(spark, sf_dir: str, src_dir: str) -> int:
    """One single-file parquet per replica: event_id AND user_id shifted so
    the CDC state's key set grows by a full 1× per batch."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    offs = {c: ev.agg(F.max(c)).first()[0] + 1 for c in ("event_id", "user_id")}
    dtypes = dict(ev.dtypes)
    os.makedirs(src_dir, exist_ok=True)
    for r in range(BATCHES):
        batch = ev
        for c, off in offs.items():
            batch = batch.withColumn(c, (F.col(c) + F.lit(r * off)).cast(dtypes[c]))
        _write_single_file(batch, f"{src_dir}/_stage", f"{src_dir}/batch_{r:03d}.parquet")
    _ascending_mtimes(
        [os.path.join(src_dir, f) for f in os.listdir(src_dir) if f.endswith(".parquet")]
    )
    return BATCHES


def _batch_walls(query) -> list[float]:
    """Per-micro-batch wall seconds from the engine's progress telemetry
    (triggerExecution covers the whole foreachBatch body)."""
    walls = {}
    for p in query.recentProgress:
        if p.get("numInputRows", 0) > 0:
            walls[p["batchId"]] = p["durationMs"]["triggerExecution"] / 1000.0
    return [walls[b] for b in sorted(walls)]


def stress_dedup(spark, sf_dir: str, out_dir: str) -> dict:
    from scala_etl_test_spark.streaming.dedup import init_index, stream_incremental_dedup
    from scala_etl_test_spark.streaming.sources import stream_documents_parquet

    src = os.path.join(out_dir, "dedup_src")
    _build_doc_batches(spark, sf_dir, src)
    index_dir = os.path.join(out_dir, "dedup_index")
    init_index(spark, index_dir, None, "text", "doc_id")
    q = stream_incremental_dedup(
        stream_documents_parquet(spark, f"{src}/*.parquet", max_files_per_trigger=1),
        index_dir,
        os.path.join(out_dir, "dedup_pairs"),
        os.path.join(out_dir, "dedup_ckpt"),
        threshold=0.2,
    )
    q.awaitTermination()
    walls = _batch_walls(q)
    pairs = spark.read.parquet(os.path.join(out_dir, "dedup_pairs"))
    per_batch_pairs = {
        int(r["batch_id"]): int(r["n"])
        for r in pairs.groupBy("batch_id").count().withColumnRenamed("count", "n").collect()
    }
    index_rows = spark.read.parquet(f"{index_dir}/shingles").count()
    head = sorted(walls[:3])[len(walls[:3]) // 2] if walls else 0.0
    return {
        "twin": "dedup_incremental_lsh",
        "batches": len(walls),
        "per_batch_wall_s": [round(w, 2) for w in walls],
        "last_over_first3_median": round(walls[-1] / head, 2) if head else None,
        "pairs_per_batch": [per_batch_pairs.get(b, 0) for b in range(len(walls))],
        "index_shingle_rows": index_rows,
    }


def stress_cdc(spark, sf_dir: str, out_dir: str) -> dict:
    from scala_etl_test_spark.streaming.cdc import read_state, stream_upsert
    from scala_etl_test_spark.streaming.sources import stream_events_parquet

    src = os.path.join(out_dir, "cdc_src")
    _build_event_batches(spark, sf_dir, src)
    table = os.path.join(out_dir, "cdc_table")
    q = stream_upsert(
        stream_events_parquet(spark, src, max_files_per_trigger=1),
        table,
        os.path.join(out_dir, "cdc_ckpt"),
        ["user_id"],
        "ts",
    )
    q.awaitTermination()
    walls = _batch_walls(q)
    state_rows = read_state(spark, table).count()
    head = sorted(walls[:3])[len(walls[:3]) // 2] if walls else 0.0
    return {
        "twin": "cdc_upsert",
        "batches": len(walls),
        "per_batch_wall_s": [round(w, 2) for w in walls],
        "last_over_first3_median": round(walls[-1] / head, 2) if head else None,
        "state_rows": state_rows,
    }


def stress_cdc_bucketed(spark, sf_dir: str, out_dir: str) -> dict:
    """Bucketed-state CDC (VERDICT r7 item 5): same 10-batch feed as the
    plain twin, state maintained as an external bucketed catalog table.
    The per-batch JOIN is exchange-free on the state side (plan-gated in
    tests/test_streaming.py); the per-batch wall still contains the
    documented linear state REWRITE, so the signal here is (a) walls grow
    at most linearly while state keys grow 10× and (b) the bucketed twin
    tracks the plain twin (the co-location is not a regression at small
    scale and removes the state shuffle at large scale)."""
    from scala_etl_test_spark.streaming.cdc import (
        read_state_bucketed,
        stream_upsert_bucketed,
    )
    from scala_etl_test_spark.streaming.sources import stream_events_parquet

    src = os.path.join(out_dir, "cdcb_src")
    _build_event_batches(spark, sf_dir, src)
    table = os.path.join(out_dir, "cdcb_table")
    q = stream_upsert_bucketed(
        stream_events_parquet(spark, src, max_files_per_trigger=1),
        table,
        os.path.join(out_dir, "cdcb_ckpt"),
        ["user_id"],
        version_col="ts",
    )
    q.awaitTermination()
    walls = _batch_walls(q)
    # zero batches (empty sf events / failed feed build) → no state table;
    # report empty like the walls/head guards instead of dying (ADVICE r8)
    state = read_state_bucketed(spark, table)
    state_rows = state.count() if state is not None else 0
    head = sorted(walls[:3])[len(walls[:3]) // 2] if walls else 0.0
    return {
        "twin": "cdc_upsert_bucketed",
        "batches": len(walls),
        "per_batch_wall_s": [round(w, 2) for w in walls],
        "last_over_first3_median": round(walls[-1] / head, 2) if head else None,
        "state_rows": state_rows,
    }


def stress_cdc_crossover(spark, sf_dir: str, out_dir: str) -> dict:
    """Head-to-head per-batch merge wall, plain vs bucketed state, at
    growing state key counts with realistic (400-byte) payloads — the
    crossover measurement VERDICT r8 item 4 demanded instead of the
    asserted trade. Times the two merge BODIES directly (same streaming
    scaffolding otherwise), 5 batches of 1% of the keys each.

    Reading it (r9 numbers in the round log): after the one-scan merge
    reformulation the bucketed twin sits within ~1.2-1.3× of plain at
    100k-1M keys (r8: 2-3×), with the residual being saveAsTable DDL +
    the in-bucket sort. The O(batch)-vs-O(state) SHUFFLE win cannot show
    as wall time on a single JVM (a local full-state shuffle is memory
    bandwidth); its evidence is the plan — exactly one batch-sized
    Exchange (plan-gated) — which prices in when the shuffle crosses a
    network. Flatness across the 10× key growth is the scale signal."""
    import time as _time

    from pyspark.sql import functions as F

    from scala_etl_test_spark.streaming.cdc import (
        merge_into_bucketed_state,
        merge_into_state,
        read_state,
        read_state_bucketed,
    )

    wide = "x" * 400
    cpus = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def mk(K, B, ts):
        return spark.range(B).select(
            (F.col("id") * 17 % K).alias("user_id"),
            F.lit(ts).cast("long").alias("ts"),
            F.concat(F.lit(wide), F.col("id").cast("string")).alias("payload"),
        )

    per_k = {}
    for K in (100_000, 1_000_000):
        pd_, bd = f"{out_dir}/xplain_{K}", f"{out_dir}/xbuck_{K}"
        seed = spark.range(K).select(
            F.col("id").alias("user_id"),
            F.lit(0).cast("long").alias("ts"),
            F.concat(F.lit(wide), F.lit("seed")).alias("payload"),
        )
        merge_into_state(spark, seed, pd_, ["user_id"], "ts")
        merge_into_bucketed_state(spark, seed, bd, ["user_id"], cpus, "ts")
        B = max(K // 100, 1000)
        pw, bw = [], []
        for b in range(1, 6):
            batch = mk(K, B, b)
            t0 = _time.perf_counter()
            merge_into_state(spark, batch, pd_, ["user_id"], "ts")
            pw.append(round(_time.perf_counter() - t0, 3))
            t0 = _time.perf_counter()
            merge_into_bucketed_state(spark, batch, bd, ["user_id"], cpus, "ts")
            bw.append(round(_time.perf_counter() - t0, 3))
        p_state, b_state = read_state(spark, pd_), read_state_bucketed(spark, bd)
        rows_ok = (
            (p_state.count() if p_state is not None else 0)
            == (b_state.count() if b_state is not None else 0)
            == K
        )
        per_k[K] = {
            "batch_rows": B,
            "plain_walls": pw,
            "bucketed_walls": bw,
            "plain_med": sorted(pw)[len(pw) // 2],
            "bucketed_med": sorted(bw)[len(bw) // 2],
            "rows_ok": rows_ok,
        }
        per_k[K]["ratio_bucketed_over_plain"] = round(
            per_k[K]["bucketed_med"] / per_k[K]["plain_med"], 2
        )
    return {"twin": "cdc_crossover", "per_keys": per_k}


def stress_ann_append(spark, sf_dir: str, out_dir: str) -> dict:
    """Per-batch wall of the IVF maintenance stream (streaming/ann.py) as
    the corpus grows 10×: batch N appends a 1×-sized embedding batch to an
    index holding N-1 batches. Per-batch work is O(batch·k) assignment +
    an O(batch) cell-routed write — INDEPENDENT of corpus size — so the
    trend must stay flat; a rising trend means an append started reading
    or rewriting the corpus."""
    import time as _time

    from pyspark.sql import functions as F

    from scala_etl_test_spark.streaming.ann import (
        append_batch_to_ivf,
        init_ivf_index,
        read_ivf_corpus,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    max_id = emb.agg(F.max("vec_id")).first()[0] + 1
    d = os.path.join(out_dir, "ann_index")
    init_ivf_index(spark, d, emb, n_centroids=16)
    walls = []
    for r in range(1, BATCHES):
        batch = emb.select(
            (F.col("vec_id") + F.lit(r * max_id)).alias("vec_id"), "embedding", "label"
        )
        t0 = _time.perf_counter()
        append_batch_to_ivf(spark, d, batch, r)
        walls.append(round(_time.perf_counter() - t0, 2))
    head = sorted(walls[:3])[len(walls[:3]) // 2] if walls else 0.0
    n_rows = read_ivf_corpus(spark, d).count()
    # lifecycle tail (r10): one probe before/after compacting the
    # 10-generation spine to one — results must be identical and the
    # file count must collapse by ~the batch count
    from scala_etl_test_spark.streaming.ann import compact_ivf_index, ivf_index_topk

    qv = [float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    probe_before = [r["vec_id"] for r in ivf_index_topk(spark, d, qv, k=100).collect()]
    n_files_before = sum(1 for _ in pathlib_rglob_parquet(d))
    t0 = _time.perf_counter()
    compact_ivf_index(spark, d)
    compact_s = round(_time.perf_counter() - t0, 2)
    probe_after = [r["vec_id"] for r in ivf_index_topk(spark, d, qv, k=100).collect()]
    return {
        "twin": "ann_append",
        "batches": len(walls),
        "per_batch_wall_s": walls,
        "last_over_first3_median": round(walls[-1] / head, 2) if head else None,
        "corpus_rows": n_rows,
        "compact_s": compact_s,
        "files_before_after_compact": [n_files_before, sum(1 for _ in pathlib_rglob_parquet(d))],
        "probe_stable_through_compact": probe_before == probe_after,
    }


def pathlib_rglob_parquet(index_dir: str):
    import pathlib

    return pathlib.Path(index_dir, "corpus").rglob("*.parquet")


def stress_cov_moments(spark, sf_dir: str, out_dir: str) -> dict:
    """Per-batch wall of the covariance-moment maintenance stream
    (streaming/moments.py) as batches accumulate: each append reduces ONE
    1×-sized embedding batch to its d²-bounded partial table — work is
    O(batch·d²) regardless of how many batches the store already holds,
    so the trend must stay flat. The serve-side merge is also timed once
    at the end (bounded by batches × d² rows, NOT stream length)."""
    import time as _time

    from pyspark.sql import functions as F

    from scala_etl_test_spark.streaming.moments import (
        append_batch_moments,
        compact_moments,
        forget_from_moments,
        read_covariance,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    max_id = emb.agg(F.max("vec_id")).first()[0] + 1
    d = os.path.join(out_dir, "cov_moments")
    walls = []
    for r in range(BATCHES):
        batch = emb.select(
            (F.col("vec_id") + F.lit(r * max_id)).alias("vec_id"), "embedding", "label"
        )
        t0 = _time.perf_counter()
        append_batch_moments(spark, d, batch, r)
        walls.append(round(_time.perf_counter() - t0, 2))
    head = sorted(walls[:3])[len(walls[:3]) // 2] if walls else 0.0
    t0 = _time.perf_counter()
    n_rows = read_covariance(spark, d).count()
    serve_s = round(_time.perf_counter() - t0, 2)
    # lifecycle tail (r10): erase one batch's worth (one negated append —
    # O(batch·d²) like any append), then compact the 11-dir spine to one
    # and re-serve; row count must be unchanged through both
    t0 = _time.perf_counter()
    forget_from_moments(spark, d, emb.select("vec_id", "embedding", "label"), erasure_id=0)
    erase_s = round(_time.perf_counter() - t0, 2)
    t0 = _time.perf_counter()
    compact_moments(spark, d)
    compact_s = round(_time.perf_counter() - t0, 2)
    t0 = _time.perf_counter()
    n_after = read_covariance(spark, d).count()
    return {
        "twin": "cov_moments",
        "batches": len(walls),
        "per_batch_wall_s": walls,
        "last_over_first3_median": round(walls[-1] / head, 2) if head else None,
        "serve_merge_s": serve_s,
        "cov_rows": n_rows,
        "erase_s": erase_s,
        "compact_s": compact_s,
        "serve_after_compact_s": round(_time.perf_counter() - t0, 2),
        "cov_rows_after_lifecycle": n_after,
    }


_TWINS = {
    "dedup": stress_dedup,
    "cdc": stress_cdc,
    "cdc_bucketed": stress_cdc_bucketed,
    "cdc_crossover": stress_cdc_crossover,
    "ann_append": stress_ann_append,
    "cov_moments": stress_cov_moments,
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--twin", default="all", choices=[*_TWINS, "all"])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("out_dir", nargs="?", default="/tmp/stress_streaming")
    ns = ap.parse_args()

    from scala_etl_test_spark.session import build_session

    shutil.rmtree(ns.out_dir, ignore_errors=True)
    os.makedirs(ns.out_dir, exist_ok=True)
    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    twins = list(_TWINS) if ns.twin == "all" else [ns.twin]
    for t in twins:
        print(json.dumps(_TWINS[t](spark, ns.sf_dir, ns.out_dir)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
