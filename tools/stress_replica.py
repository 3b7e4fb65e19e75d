"""10×-scale-UP stress run for the document-fanout operator family.

    python tools/stress_replica.py [sf_dir] [out_dir]

Builds a 10× replica of ``documents`` (default base: /root/testdata/sf0.1)
and times the _spread-family queries at 1× vs 10×, printing one JSON line
of wall ratios. Reading them: join/shuffle-light ops amortize overhead and
land ~1-3×; compute-bound narrow ops approach LINEAR (~8-10×) once 32
cores saturate at both scales — that is the expected ceiling, not a trap.
The trap signature is a ratio near-or-above linear on an op whose cost
should be join-bounded: this harness found the r4 edit-distance "33×"
(single-file layout artifact), the SNM n² nested loop, and the r6
simhash single-chunk banding quadratic (9.6× → 6.2× after multi-piece
blocking, the residual being the linear fingerprint compute).

Two traps the replica construction must avoid (see also the r4/r5 logs):

- **Verbatim replication** makes every document a 10-way exact dup, which
  explodes candidate-pair counts and measures the dup explosion, not the
  operator. Each replica instead gets a DETERMINISTIC per-(replica, doc)
  word shuffle — order by md5(replica|doc_id|pos|word) — so global word/
  gram frequency distributions stay realistic while cross-replica docs
  stop being near-dups.
- **Single-file layout**: a compacted parquet file glues into ONE scan
  partition and serializes all per-doc fanout, masquerading as quadratic
  scaling. The replica is written as a 32-file directory. (The engine's
  ``_spread`` guard now also defends the single-file case at runtime; the
  multi-file layout here keeps the measurement about the OPERATOR.)

Non-document tables are not replicated — only documents-backed queries
run. Requires ~10× the sf documents footprint free under ``out_dir``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRESS_QUERIES = [
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "duplicate_spans",
    "chunk_dedup",
    "winnow_fingerprints",
    "winnow_overlap",
    "dedup_edit_distance",
    "text_quality",
]

REPLICAS = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_stress10x"

    from pyspark.sql import functions as F

    from scala_etl_test_spark.caching import release_persisted
    from scala_etl_test_spark.operators.dedup import words
    from scala_etl_test_spark.plans.queries import QUERIES
    from scala_etl_test_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    max_id = docs.agg(F.max("doc_id")).first()[0] + 1

    # deterministic per-(replica, doc) word shuffle, all JVM-side: key each
    # word position with md5(replica|doc_id|pos|word), array_sort on the
    # key, then strip back to words
    rep = spark.range(REPLICAS).withColumnRenamed("id", "_rep")
    keyed = F.transform(
        words("text"),
        lambda w, i: F.struct(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("_rep").cast("string"),
                    F.col("doc_id").cast("string"),
                    i.cast("string"),
                    w,
                )
            ).alias("k"),
            w.alias("w"),
        ),
    )
    shuffled = F.array_join(F.transform(F.array_sort(keyed), lambda s: s["w"]), " ")
    replica = (
        docs.crossJoin(rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(max_id))
        .withColumn("text", shuffled)
        .drop("_rep")
    )
    dest = os.path.join(out_dir, "documents.parquet")
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    t0 = time.perf_counter()
    replica.repartition(32).write.mode("overwrite").parquet(dest)
    build_s = time.perf_counter() - t0
    n_docs = spark.read.parquet(dest).count()

    def run(name: str, d: str) -> float:
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            QUERIES[name](spark, d).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - start)
            release_persisted()
            spark.catalog.clearCache()
        return best

    base, big, ratio = {}, {}, {}
    for name in STRESS_QUERIES:
        run(name, sf_dir)  # warm codegen on the small side first
        base[name] = round(run(name, sf_dir), 3)
        big[name] = round(run(name, out_dir), 3)
        ratio[name] = round(big[name] / base[name], 2) if base[name] else None
    print(
        json.dumps(
            {
                "metric": "stress10x_wall_ratio",
                "replicas": REPLICAS,
                "docs_10x": n_docs,
                "build_s": round(build_s, 1),
                "base_s": base,
                "big_s": big,
                "ratio_10x": ratio,
            }
        )
    )


if __name__ == "__main__":
    main()
