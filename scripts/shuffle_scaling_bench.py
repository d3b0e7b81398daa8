#!/usr/bin/env python3
"""N→4N scaling on the shuffle-heavy stages (VERDICT r3 "Next round" #5).

The pinned extract-path protocol (``scaling_bench.py``) measures the
parse stage; a 100 TB run spends its time in the dedup/CC shuffles.
This measures those two stages under the same interleaved-pair /
median-of-per-pair-efficiencies protocol, with one extra requirement:
the input must be large enough that per-round FIXED latency (job
submission, shuffle-stage setup, checkpoint barriers — costs that do
not shrink with executor count and do not grow with data) doesn't
masquerade as poor scaling.  Measured at sf0.1 and even sf1, both
stages are latency-bound — local[2] ties or beats local[8] because a
Kiveris CC round or an LSH band join on 50k docs carries ~100 ms of
parallel work behind ~500 ms of fixed stage latency.  The north rule's
scaling criterion is about the work-proportional regime a 100 TB run
lives in, so ``--prepare`` synthesizes a work-dominated input:

* ``documents.parquet`` — the sf1 documents replicated ``--reps``×
  with every token suffixed per replica (the make_scale_data
  transform: texts/shingles disjoint across replicas, so per-shingle
  document frequency stays flat and the band join's candidate count
  scales linearly like a real corpus, not quadratically like verbatim
  copies).
* ``edges.parquet`` — hash-id chain components (chain length 16,
  node ids xxhash64-permuted so min-id ordering is random, the
  worst case Kiveris is designed for; consecutive ids would make
  every round trivially convergent).

Stages:

* ``minhash`` — ``dedup_minhash_lsh`` in the production config
  (xxhash64, 16 hashes / 4 bands): shingle explode → map-side
  signature agg → band equi-join.  The dedup shuffle.
* ``cc`` — ``connected_components`` (alternating large-star /
  small-star): one groupBy + one equi-join per phase per round.  The
  canonicalization shuffle.

Each sample is a fresh-JVM subprocess at local[N] immediately followed
by one at local[4N] (temporally adjacent, so host-capacity drift hits
both levels of a pair similarly and partially cancels in the ratio).
Inside a subprocess the stage first runs on a 2 % sample (spawns
python workers, compiles codegen — one-time costs that are not the
scaling question) and the full input is then timed best-of ``--iters``.
Reported: the median of per-pair efficiencies, plus every pair, plus
row throughput at the representative pair — same dual reporting as the
extract record (on this single box the 4N level shares one memory bus
and one disk for shuffle files; a multi-executor cluster gives each
executor its own, so the raw number is the sandbox floor, not the
cluster expectation).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DATA = os.path.join(ROOT, ".bench_data", "shuffle")
SF1_DOCS = os.path.join(ROOT, ".bench_data", "sf1", "documents.parquet")


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    # Shuffle partitions FIXED across levels (not scaled with cores):
    # the scaling experiment is "the same job, same plan, same
    # partitioning — more executor threads", exactly what adding
    # executors to a cluster does. Letting the partition count follow
    # the core count would compare two different physical plans.
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shuffle-scaling-bench")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SHUFFLE_BENCH_PARTS", "32"))
        # AQE OFF here, deliberately (default elsewhere in the repo is
        # on): both stages are fixed-shape — CC re-runs the identical
        # two-phase round ~6 times and the LSH band join has known
        # cardinality — so runtime re-planning buys nothing and its
        # per-query-stage materialization barrier costs real latency.
        # Interleaved A/B on this host: minhash 242s (on) vs 142s
        # (off) at local[8]; cc 196s vs 164s at local[2], and the gap
        # WIDENS with cores (cc 2→8 efficiency 0.52 on, 0.73 off)
        # because the re-plan latency is serial. The production advice
        # this encodes: disable adaptive coalescing for iterative
        # fixed-partitioning jobs; keep AQE for ad-hoc analytics.
        .config("spark.sql.adaptive.enabled",
                os.environ.get("SHUFFLE_BENCH_AQE", "false"))
        # Shuffle/checkpoint block compression codec (lz4 default).
        # zstd compresses int64-pair shuffle blocks ~2x smaller for
        # more CPU per byte — on a box whose 8-thread level is
        # memory-bandwidth/spill-bound that trade can buy scaling
        # headroom, and on a real cluster it cuts network bytes the
        # same way. Exposed for A/B measurement.
        .config("spark.io.compression.codec",
                os.environ.get("SHUFFLE_BENCH_CODEC", "lz4"))
        .config("spark.driver.memory", "48g")
        # shuffle files + localCheckpoint blocks on tmpfs: on this
        # single box every thread shares ONE spinning/virtio disk for
        # spill, a resource a cluster provisions per executor; putting
        # it in RAM isolates the CPU-scaling question the north rule
        # asks from the shared-disk term (set SHUFFLE_BENCH_LOCALDIR
        # to override / empty to keep the default disk)
        .config("spark.local.dir",
                os.environ.get("SHUFFLE_BENCH_LOCALDIR", "/dev/shm/spark-bench")
                or "/tmp")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.locality.wait", "0")
        .getOrCreate()
    )


# ---------------------------------------------------------------- prepare

def prepare(reps: int, n_edges: int) -> None:
    from pyspark.sql import DataFrame, functions as F

    spark = build_spark(16)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(SF1_DOCS)
    d_step = 1
    m = docs.agg(F.max("doc_id")).first()[0]
    while d_step <= m:
        d_step *= 10

    def rep(r: int) -> DataFrame:
        if r == 0:
            return docs
        return docs.select(
            (F.col("doc_id") + F.lit(r * d_step)).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1q{r}").alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )

    big = rep(0)
    for r in range(1, reps):
        big = big.unionByName(rep(r))
    big.repartition(64).write.mode("overwrite").parquet(
        os.path.join(DATA, "documents.parquet")
    )
    n_docs = spark.read.parquet(os.path.join(DATA, "documents.parquet")).count()
    print(f"documents: {n_docs} rows")

    # chain edges: chain c = nodes c*L .. c*L+L-1, ids hash-permuted
    L = 16
    n_chains = n_edges // (L - 1) + 1
    edges = (
        spark.range(n_chains * L)
        .where((F.col("id") % L) != L - 1)
        .select(
            F.xxhash64("id").alias("src"),
            F.xxhash64(F.col("id") + 1).alias("dst"),
        )
        .limit(n_edges)
    )
    edges.repartition(64).write.mode("overwrite").parquet(
        os.path.join(DATA, "edges.parquet")
    )
    print(f"edges: {spark.read.parquet(os.path.join(DATA, 'edges.parquet')).count()} rows")
    spark.stop()


# --------------------------------------------------- hardware ceiling
# Workload-matched single-box ceilings (no Spark, no JVM), same role as
# scaling_bench.py's parse ceiling: how much does THIS box degrade from
# N to 4N processes on a similar memory/CPU mix? No framework can
# exceed it; on a multi-executor cluster each executor owns its memory
# bus, so the cluster ceiling is ~1.0.

_TEXTS: list = []


def _load_texts():
    # Pool initializer: each worker loads its own copy — shipping text
    # chunks through Pool.map pickles them ALL in the single parent
    # process, which starves 8 workers but not 2 and masquerades as a
    # hardware ceiling (measured: 0.35 "ceiling" with parent-fed
    # chunks, 0.8+ with worker-local data and index units)
    import duckdb

    global _TEXTS
    _TEXTS = [
        r[0] for r in duckdb.sql(
            f"select text from read_parquet('{DATA}/documents.parquet/*.parquet') "
            "where text is not null limit 200000"
        ).fetchall()
    ]


def _shingle_chunk(unit) -> int:
    # minhash map-side proxy: tokenize, 3-gram shingles, hash+min —
    # string traffic + hashing, the same mix as the explode stage
    k, step = unit
    n = 0
    for t in _TEXTS[k::step]:
        toks = t.split()
        mn = (1 << 62)
        for i in range(len(toks) - 2):
            h = hash((toks[i], toks[i + 1], toks[i + 2]))
            if h < mn:
                mn = h
        n += 1
    return n


def _sortgroup_chunk(seed) -> int:
    # CC round proxy: sort + group + min over int64 pairs — the
    # bandwidth-bound core of a groupBy-min shuffle round
    import numpy as np

    rng = np.random.default_rng(seed)
    u = rng.integers(0, 1 << 40, size=2_000_000)
    v = rng.integers(0, 1 << 40, size=2_000_000)
    order = np.argsort(u, kind="stable")
    us, vs = u[order], v[order]
    _, starts = np.unique(us, return_index=True)
    return int(np.minimum.reduceat(vs, starts).sum() & 0x7FFFFFFF)


def calibrate_ceiling(n: int, xn: int, samples: int = 5) -> dict:
    """Median of per-pair efficiencies over interleaved (N, 4N) pairs —
    the same estimator as the Spark protocol; single short pure-python
    runs swing ±4× with host weather (measured 0.28–1.39 on identical
    work), so a one-shot ratio is meaningless here."""
    import multiprocessing as mp

    def run(workload, units, nproc, init) -> float:
        # index-only work units; data lives worker-local (see
        # _load_texts) so the parent never serializes payloads
        with mp.Pool(nproc, initializer=init) as pool:
            pool.map(workload, units[: nproc])  # warm workers/imports
            t0 = time.time()
            pool.map(workload, units)
            return time.time() - t0

    out = {}
    workloads = {
        "shingle": (_shingle_chunk, [(i, 64) for i in range(64)], _load_texts),
        "sortgroup": (_sortgroup_chunk, list(range(64)), None),
    }
    for name, (fn, units, init) in workloads.items():
        effs = []
        for _ in range(samples):
            lo = run(fn, units, n, init)
            hi = run(fn, units, xn, init)
            effs.append((lo / hi) / (xn / n))
        effs.sort()
        out[name] = round(statistics.median(effs), 3)
        out[name + "_pairs"] = [round(e, 3) for e in effs]
    return out


# ------------------------------------------------------------------ child

def run_stage(stage: str, cpus: int, iters: int) -> None:
    from pyspark.sql import functions as F

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if stage == "minhash":
        from mentor_rdf_parsers_spark.operators.dedup import dedup_minhash_lsh

        df = spark.read.parquet(os.path.join(DATA, "documents.parquet"))

        def job(d):
            return dedup_minhash_lsh(
                d, "doc_id", "text", num_hashes=16, bands=4,
                shingle_n=3, hash_fn="xxhash64",
            )
    elif stage == "cc":
        from mentor_rdf_parsers_spark.operators.canonicalize import (
            connected_components,
        )

        df = spark.read.parquet(os.path.join(DATA, "edges.parquet"))
        job = connected_components
    else:
        raise SystemExit(f"unknown stage {stage}")

    n_rows = df.count()
    # warm: same plan shape on a 2% sample — python workers spawned,
    # codegen compiled, parquet footers read; none of these are the
    # scaling question.
    job(df.sample(0.02, seed=1)).agg(F.count("*")).collect()

    best = None
    for _ in range(max(iters, 1)):
        t0 = time.time()
        job(df).agg(F.count("*")).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"stage": stage, "cpus": cpus, "rows": n_rows,
                      "sec": round(best, 3)}))
    spark.stop()


def child(stage: str, cpus: int, iters: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--stage", stage,
         "--cpus", str(cpus), "--iters", str(iters)],
        capture_output=True, text=True, timeout=3600, cwd=ROOT,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


# ----------------------------------------------------------------- parent

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--ceiling", action="store_true",
                    help="measure the pure-python workload ceilings only")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--edges", type=int, default=4_000_000)
    ap.add_argument("--stage", help="(child mode) run one stage and exit")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--iters", type=int, default=1)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--xn", type=int, default=8)
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--stages", default="minhash,cc")
    args = ap.parse_args()

    if args.prepare:
        prepare(args.reps, args.edges)
        return
    if args.ceiling:
        c = calibrate_ceiling(args.n, args.xn, args.samples)
        print(json.dumps(c))
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M UTC")
        with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\nWorkload-matched hardware ceilings {stamp} "
                f"(pure python/numpy, no Spark/JVM, {args.n}→{args.xn} "
                f"processes; median of per-pair efficiencies, "
                f"{args.samples} interleaved pairs): shingle+hash "
                f"{c['shingle']} (pairs {c['shingle_pairs']}), sort+group "
                f"int64 {c['sortgroup']} (pairs {c['sortgroup_pairs']}). "
                f"No framework exceeds its box's ceiling; a "
                f"multi-executor cluster's is ~1.0.\n"
            )
        return
    if args.stage:
        run_stage(args.stage, args.cpus or 8, args.iters)
        return

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    records = {}
    for stage in stages:
        pairs = []
        for i in range(args.samples):
            lo = child(stage, args.n, args.iters)
            hi = child(stage, args.xn, args.iters)
            eff = (lo["sec"] / hi["sec"]) / (args.xn / args.n)
            pairs.append((eff, lo, hi))
            print(json.dumps({"stage": stage, "sample": i,
                              "sec_n": lo["sec"], "sec_xn": hi["sec"],
                              "pair_efficiency": round(eff, 3)}))
        pairs.sort(key=lambda p: p[0])
        med = statistics.median(p[0] for p in pairs)
        _, lo, hi = min(pairs, key=lambda p: abs(p[0] - med))
        records[stage] = {
            "rows": lo["rows"],
            "sec_n": lo["sec"], "sec_xn": hi["sec"],
            "tput_n": round(lo["rows"] / lo["sec"]),
            "tput_xn": round(hi["rows"] / hi["sec"]),
            "speedup": round(lo["sec"] / hi["sec"], 2),
            "efficiency": round(med, 3),
            "pair_efficiencies": [round(p[0], 3) for p in pairs],
        }
        print(json.dumps({stage: records[stage]}))

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%M UTC")
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write(
            f"\n## Shuffle-stage scaling run {stamp} "
            f"(local[{args.n}] → local[{args.xn}], "
            f"{args.samples} interleaved pairs)\n\n"
            f"Work-dominated synthetic input "
            f"(scripts/shuffle_scaling_bench.py --prepare): documents = "
            f"sf1 × {args.reps} with per-replica disjoint tokens; edges "
            f"= xxhash64-permuted chains of length 16. Fresh JVM per "
            f"measurement, 2%-sample warm-up (workers+codegen), "
            f"best-of-{args.iters}; efficiency = median of per-pair "
            f"ratios.\n\n"
            f"| stage | rows | local[{args.n}] | local[{args.xn}] | "
            f"speedup | efficiency | pairs |\n"
            f"|---|---|---|---|---|---|---|\n"
        )
        for stage, r in records.items():
            f.write(
                f"| {stage} | {r['rows']} | {r['sec_n']}s "
                f"({r['tput_n']}/s) | {r['sec_xn']}s ({r['tput_xn']}/s) "
                f"| {r['speedup']}x | **{r['efficiency']}** | "
                f"{r['pair_efficiencies']} |\n"
            )
        f.write(
            "\nSingle-box caveat (same dual reporting as the extract "
            "record): at local[{xn}] all {xn} threads share one memory "
            "bus and one disk for shuffle spill; the pure-python "
            "parse ceiling measured 0.83-0.86 at 2→8 on this host, and "
            "shuffle stages are strictly more bandwidth-bound than "
            "parse. On a multi-executor cluster each executor owns its "
            "bus/disk, so these raw numbers are the sandbox floor.\n"
            .format(xn=args.xn)
        )
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
