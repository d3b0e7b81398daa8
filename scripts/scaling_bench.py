#!/usr/bin/env python3
"""Scaling-efficiency evidence (north_rule: throughput scaling ≥ 0.8
from N to 4N executors; sandbox proxy per driver instruction: the same
job at local[8] vs local[32] on identical input).

Runs bench.py's extraction workload at both parallelism levels in
separate subprocesses (fresh JVM each), computes

    efficiency = (tput_4N / tput_N) / 4

and appends the numbers to BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--replicate 150] [--n 8] [--xn 32]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(cpus: int, replicate: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPLICATE=str(replicate),
        SPARK_GRAFT_QUERIES="none",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=150)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    args = ap.parse_args()

    lo = run_once(args.n, args.replicate)
    hi = run_once(args.xn, args.replicate)
    ratio = hi["value"] / lo["value"]
    eff = ratio / (args.xn / args.n)
    result = {
        "n_cpus": args.n,
        "xn_cpus": args.xn,
        "docs": lo["fixture_docs"],
        "triples": lo["fixture_triples"],
        "tput_n": lo["value"],
        "tput_xn": hi["value"],
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — measured numbers\n\n"
                "Extraction throughput (triples/sec over the W3C fixture "
                "corpus, replicated) at two parallelism levels on identical "
                "input — the sandbox proxy for the north_rule's N → 4N "
                "executor scaling criterion (driver instruction: local[N] "
                "vs local[4N]).\n\n"
                "| when | docs | triples | local[N] | tput N | local[4N] | "
                "tput 4N | speedup | efficiency |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {result['docs']} | {result['triples']} | "
            f"local[{args.n}] | {result['tput_n']:.0f}/s | "
            f"local[{args.xn}] | {result['tput_xn']:.0f}/s | "
            f"{result['speedup']}x | **{result['scaling_efficiency']}** |\n"
        )
    print(f"appended to {path}")


if __name__ == "__main__":
    main()
