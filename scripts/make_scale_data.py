"""Deterministic 10x scale-up of the driver testdata for the sf1 bench.

/root/testdata is read-only and ships sf<=0.1, so the order-of-magnitude
scaling evidence (VERDICT r2 item 1) needs a synthesized sf1. This
replicates sf0.1 ten times with the SAME distributions, not verbatim
copies — verbatim duplication would corrupt the scaling measurement
(10x exact-duplicate texts inflate every shingle's document frequency
10x, turning the near-dup equi-joins quadratic in ways a real 10x
corpus is not):

* fact keys are offset per replica (orders/lineitem/customer/supplier/
  part/events ids) so joins stay key-consistent and cardinalities scale
  linearly; dimension tables (region, nation) stay fixed, as in TPC-H.
* documents: replica r>0 suffixes every token with ``r{r}`` and the
  source with ``_r{r}`` — texts/shingles are disjoint across replicas
  (same per-shingle df distribution, 10x the shingles; 10x the source
  chains at the same chain length).
* embeddings: replica r>0 deterministically perturbs each component so
  LSH/IVF bucket occupancy scales like fresh random vectors instead of
  10-way exact collisions.

Replica 0 is byte-identical to sf0.1, so sf1 is a superset.

Usage: python scripts/make_scale_data.py [--reps 10] [--out .bench_data/sf1]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"


def _union_reps(df: DataFrame, reps: int, fn) -> DataFrame:
    return functools.reduce(
        DataFrame.unionByName, (fn(df, r) for r in range(reps))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".bench_data", "sf1",
        ),
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("make-scale-data")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def rd(name: str) -> DataFrame:
        return spark.read.parquet(f"{args.src}/{name}.parquet")

    def wr(df: DataFrame, name: str, parts: int = 8) -> None:
        path = f"{args.out}/{name}.parquet"
        df.repartition(parts).write.mode("overwrite").parquet(path)
        print(f"wrote {name}: {spark.read.parquet(path).count()} rows")

    def off(col: str, step: int, r: int) -> F.Column:
        return (F.col(col) + F.lit(r * step)).alias(col)

    def keep(df: DataFrame, *except_cols: str) -> list:
        return [c for c in df.columns if c not in except_cols]

    reps = args.reps

    # key steps: one fixed power-of-ten above each table's max key so
    # replica ranges never collide (computed once, deterministic)
    def step_of(df: DataFrame, col: str) -> int:
        m = df.agg(F.max(col)).first()[0]
        s = 1
        while s <= m:
            s *= 10
        return s

    orders = rd("orders")
    customer = rd("customer")
    supplier = rd("supplier")
    part = rd("part")
    events = rd("events")
    documents = rd("documents")
    embeddings = rd("embeddings")
    lineitem = rd("lineitem")

    o_step = step_of(orders, "o_orderkey")
    c_step = step_of(customer, "c_custkey")
    s_step = step_of(supplier, "s_suppkey")
    p_step = step_of(part, "p_partkey")
    e_step = step_of(events, "event_id")
    u_step = step_of(events, "user_id")
    d_step = step_of(documents, "doc_id")
    v_step = step_of(embeddings, "vec_id")

    # dims: fixed
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    wr(_union_reps(customer, reps, lambda df, r: df.select(
        off("c_custkey", c_step, r), *keep(df, "c_custkey"))), "customer")
    wr(_union_reps(supplier, reps, lambda df, r: df.select(
        off("s_suppkey", s_step, r), *keep(df, "s_suppkey"))), "supplier", 2)
    wr(_union_reps(part, reps, lambda df, r: df.select(
        off("p_partkey", p_step, r), *keep(df, "p_partkey"))), "part", 4)
    wr(_union_reps(orders, reps, lambda df, r: df.select(
        off("o_orderkey", o_step, r), off("o_custkey", c_step, r),
        *keep(df, "o_orderkey", "o_custkey"))), "orders", 16)
    wr(_union_reps(lineitem, reps, lambda df, r: df.select(
        off("l_orderkey", o_step, r), off("l_suppkey", s_step, r),
        off("l_partkey", p_step, r),
        *keep(df, "l_orderkey", "l_suppkey", "l_partkey"))), "lineitem", 32)
    wr(_union_reps(events, reps, lambda df, r: df.select(
        off("event_id", e_step, r), off("user_id", u_step, r),
        *keep(df, "event_id", "user_id"))), "events", 16)

    def doc_rep(df: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return df
        return df.select(
            off("doc_id", d_step, r),
            # every token suffixed -> replica texts/shingles disjoint
            F.regexp_replace("text", r"(\S+)", f"$1r{r}").alias("text"),
            F.concat(F.col("source"), F.lit(f"_r{r}")).alias("source"),
            *keep(df, "doc_id", "text", "source"),
        ).select(df.columns)

    wr(_union_reps(documents, reps, doc_rep), "documents", 16)

    def emb_rep(df: DataFrame, r: int) -> DataFrame:
        if r == 0:
            return df
        return df.select(
            off("vec_id", v_step, r),
            F.transform(
                "embedding",
                lambda x, i: (
                    x * (1.0 + ((i + F.lit(r * 13)) % 11 - 5) * 0.013)
                ).cast("float"),
            ).alias("embedding"),
            *keep(df, "vec_id", "embedding"),
        ).select(df.columns)

    wr(_union_reps(embeddings, reps, emb_rep), "embeddings", 8)

    spark.stop()


if __name__ == "__main__":
    main()
