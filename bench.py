"""Benchmark entry point (driver contract).

Runs the headline pipeline + representative queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:

    {"metric": "extract_triples_per_sec", "value": N, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": ..., ...}

The primary metric is extraction throughput (triples/sec) over the W3C
fixture corpus replicated ``$SPARK_GRAFT_REPLICATE`` times (default 100)
— the corpus BASELINE.json's metric is defined on. Per-query timings
cover each operator family. ``$SPARK_GRAFT_CPUS`` is the scaling knob:
run at 8 and 32 on the same input to evidence the N→4N scaling-
efficiency criterion (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("mentor-rdf-parsers-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.locality.wait", "0")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "100"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from mentor_rdf_parsers_spark.operators.extract import extract_triples, split_extract
    from mentor_rdf_parsers_spark.sources.fixtures import (
        load_fixture_documents,
        replicate_documents,
    )

    timings: dict[str, float] = {}

    # --- headline: extraction throughput over the W3C fixture corpus ---
    # base corpus built once on the driver; scale-up happens Spark-side
    # partition multiplier: tasks-per-core for the timed extract. 4 keeps
    # the straggler tail short (last wave is 1/4 of a partition's work,
    # not 1/2) without per-task overhead dominating — the knob the
    # scaling runs sweep to keep high-core runs tail-bound, not
    # wave-bound.
    parts_per_core = int(os.environ.get("SPARK_GRAFT_PARTS", "4"))
    docs = (
        replicate_documents(load_fixture_documents(spark), replicate)
        .repartition(cpus * parts_per_core, "doc_id")
        .persist()
    )
    n_docs = docs.count()  # materialize input outside the timed window
    # SPARK_GRAFT_WARM>1: repeat and keep the fastest (steady-state
    # throughput: python workers spawned, imports done, JIT warm) — the
    # scaling-efficiency runs use this so fixed startup costs do not
    # masquerade as poor scaling.
    iters = int(os.environ.get("SPARK_GRAFT_WARM", "2"))
    extract_sec = None
    for _ in range(max(iters, 1)):
        t0 = time.time()
        triples, errors = split_extract(extract_triples(docs))
        n_triples = triples.count()
        dt = time.time() - t0
        extract_sec = dt if extract_sec is None else min(extract_sec, dt)
    timings["extract_fixture_corpus"] = round(extract_sec, 3)
    docs.unpersist()

    # --- testdata pipeline + operator families ---
    qs = entrymod.queries()
    default_queries = [
        "kg_pred_counts",
        "kg_sameas_components",
        "kg_canonical_triples",
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_capped",
        "dedup_simhash_hamming",
        "quality_decontam",
        "text_profile",
        "ann_cosine_topk",
        "ann_ivf_topk",
        "rel_agg_pricing",
        "rel_join_topk",
        "rel_window_topk",
        "events_sessions",
        # on the default list since r4: the r3 single-document fact
        # funnel is gone (64 sharded N3 docs + 1 rule doc, 64-task
        # parse) and AQE is auto-resolved for the fixpoint rounds;
        # sf0.1 171.7 s (r3) -> 95.3 s (r4 representative bench)
        "kg_n3_entailment",
    ]
    env_q = os.environ.get("SPARK_GRAFT_QUERIES")
    if env_q is None:
        bench_queries = default_queries
    elif env_q in ("", "none"):
        bench_queries = []
    else:
        bench_queries = [q.strip() for q in env_q.split(",") if q.strip()]

    # SPARK_GRAFT_QUERY_WARM>1: best-of-k per query (same steady-state
    # rationale as SPARK_GRAFT_WARM on the extract path) — the shuffle-
    # stage scaling runs use this so one-time costs (python worker
    # spawn per core count, codegen) don't masquerade as poor scaling.
    q_iters = max(int(os.environ.get("SPARK_GRAFT_QUERY_WARM", "1")), 1)

    def time_query(fn) -> float:
        best = None
        for _ in range(q_iters):
            t0 = time.time()
            fn().agg(F.count("*")).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    for name in bench_queries:
        try:
            timings[name] = time_query(lambda: qs[name](spark, sf_dir))
        except Exception as exc:  # keep the bench line parseable no matter what
            timings[name] = -1.0
            print(f"bench query {name} failed: {exc}", file=sys.stderr)

    # --- production-hash minhash (xxhash64, JVM-side) ---------------------
    # `dedup_minhash_pairs` above times the md5 path solely because the
    # DuckDB oracle must reproduce the signatures bit-for-bit; production
    # runs use Spark's built-in xxhash64 (no md5, no substring bit
    # surgery). Report that path too so the headline dedup number is the
    # one a real deployment would see.
    if bench_queries:
        from mentor_rdf_parsers_spark.operators.dedup import dedup_minhash_lsh

        try:
            docs_t = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            timings["dedup_minhash_prod"] = time_query(
                lambda: dedup_minhash_lsh(
                    docs_t, "doc_id", "text", num_hashes=16, bands=4,
                    shingle_n=3, hash_fn="xxhash64",
                )
            )
        except Exception as exc:
            timings["dedup_minhash_prod"] = -1.0
            print(f"bench query dedup_minhash_prod failed: {exc}", file=sys.stderr)

    # --- headline correctness: corpus P/R vs the reference golden files ---
    # SPARK_GRAFT_SKIP_PR=1 skips it — the scaling-efficiency runs time
    # individual shuffle stages and don't need the conformance sweep in
    # every subprocess invocation.
    if os.environ.get("SPARK_GRAFT_SKIP_PR"):
        pr = {"skipped": True}
    else:
        try:
            from mentor_rdf_parsers_spark.conformance import corpus_precision_recall

            pr = corpus_precision_recall(spark)
        except Exception as exc:
            pr = {"error": str(exc)[:200]}
            print(f"bench P/R failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t > 0), 3)
    out = {
        "metric": "extract_triples_per_sec",
        "value": round(n_triples / extract_sec, 1) if extract_sec > 0 else 0,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "total_sec": total,
        "cpus": cpus,
        "fixture_docs": n_docs,
        "fixture_triples": n_triples,
        "pr_vs_reference_golden": pr,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
