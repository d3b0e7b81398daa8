"""BM25-style ranked text retrieval over the documents table.

A data-curation pipeline needs cheap corpus retrieval (pulling docs
matching an audit query, sourcing seed sets for classifiers); this is
the whole-stage-codegen version: tokenize → explode → per-(doc, term)
tf → df join → score → top-k window. No reference counterpart.

Scoring is the BM25 shape with a RATIONAL idf:

    idf(t)  = (N - df + 0.5) / (df + 0.5)          -- no logarithm
    s(d, t) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score   = fixed-order sum of s(d, t) over the query terms

`ln` is deliberately absent: Java's Math.log and C libm are only
1-ulp-accurate and need not agree, which would make a value-hashing
DuckDB oracle flaky. Every step here is rational double arithmetic in
an identical evaluation order on both engines, so scores are
bit-identical. (ln is monotone, so per-term ranking is unchanged;
cross-term weighting deviates from classic BM25 — documented, and
irrelevant to the plan shape being exercised.)

Determinism notes: dl and tf are small integers in doubles (exact at
any summation order); avgdl = exact-sum / N; the per-term partial
scores are combined as explicit columns added left-to-right, never a
floating SUM over a shuffle whose order could vary.

100 TB shape: tf explode filters to the query terms BEFORE any shuffle
(one groupBy over |terms| × matching docs), df is a |terms|-row
broadcast, the stats row is a broadcast crossJoin, and the final top-k
is one window — with a `limit` pushdown AQE turns it into
TakeOrderedAndProject.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .linking import tokens_of


def bm25_topk(
    df: DataFrame,
    query_terms: Sequence[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k documents for a bag-of-words query: (id, score, rk).

    Duplicate query terms are collapsed (first occurrence wins) — each
    term contributes once to the score; an empty query returns an empty
    result with the output schema rather than raising mid-plan.
    """
    # dict.fromkeys: dedupe while preserving order (a duplicated term
    # would otherwise get its own c{i} column and be double-counted)
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        id_type = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id {id_type}, score double, rk long"
        )
    toks = df.select(F.col(id_col).alias("id"), tokens_of(F.col(text_col)).alias("toks"))
    lens = toks.select("id", F.size("toks").cast("double").alias("dl"))
    stats = F.broadcast(
        lens.agg(
            F.avg("dl").alias("avgdl"),
            F.count("*").cast("double").alias("n_docs"),
        )
    )
    tf = (
        toks.select("id", F.explode("toks").alias("t"))
        .where(F.col("t").isin(terms))
        .groupBy("id", "t")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dft = tf.groupBy("t").agg(F.count("*").cast("double").alias("df"))
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    con = (
        tf.join(F.broadcast(dft), "t")
        .join(lens, "id")
        .crossJoin(stats)
        .select("id", "t", contrib.alias("contrib"))
    )
    # fixed-order per-term columns, then a left-to-right add: a floating
    # SUM over shuffled rows would be summation-order-dependent
    aggs = [
        F.coalesce(
            F.max(F.when(F.col("t") == term, F.col("contrib"))), F.lit(0.0)
        ).alias(f"c{i}")
        for i, term in enumerate(terms)
    ]
    per = con.groupBy("id").agg(*aggs)
    score = F.col("c0")
    for i in range(1, len(terms)):
        score = score + F.col(f"c{i}")
    s = per.select("id", F.round(score, round_dp).alias("score"))
    # distributed top-k first (TakeOrderedAndProject), THEN the rank
    # window over only k rows — a global rank window over every scored
    # doc would single-task at scale
    topk = s.orderBy(F.desc("score"), F.asc("id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    return (
        topk.withColumn("rk", F.row_number().over(w))
        .select("id", "score", F.col("rk").cast("long").alias("rk"))
    )
