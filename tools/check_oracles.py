"""Local driver-simulator: run every `queries()` entry on Spark AND its
`oracle_sql()` on DuckDB at the given SF, compare row count / columns /
sorted values. Mirrors the per-round CORRECTNESS check so mismatches
surface before the driver runs.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def run(sf_dir: str, only: list[str]) -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(norm_cell(c) for c in r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"okNO-ORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = [d[0] for d in ddf.description]
            drows = [tuple(norm_cell(c) for c in r) for r in ddf.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        status = []
        # round-1 finding: the driver's value-hasher canonicalizes Decimal
        # differently per engine — any Decimal output column is a hash
        # mismatch waiting to happen, even when str-compare passes
        for rows, side in ((srows, "spark"), (drows, "duckdb")):
            if rows and any(isinstance(c, decimal.Decimal) for c in rows[0]):
                status.append(f"{side} emits Decimal-typed columns (driver-hash hazard)")
        if sorted(scols) != sorted(dcols):
            status.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not status:
            # column-name-sorted, order-insensitive value compare
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sset = sorted(
                [tuple(str(r[i]) for i in order) for r in srows]
            )
            dset = sorted(
                [tuple(str(r[i]) for i in dorder) for r in drows]
            )
            if sset != dset:
                n_bad = sum(1 for a, b in zip(sset, dset) if a != b)
                diff = next((a, b) for a, b in zip(sset, dset) if a != b)
                status.append(f"values {n_bad} differ; first: spark={diff[0]} duck={diff[1]}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"ok   {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
    spark.stop()
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    sys.exit(1 if run(sf, only) else 0)
