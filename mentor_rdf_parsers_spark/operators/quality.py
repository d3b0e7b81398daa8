"""Corpus-quality operators for training-data pipelines: benchmark
decontamination, repetition profiling (Gopher-style quality rules), and
PII scrubbing.

No reference counterpart (the reference is a parser library); these are
the standard curation passes a 100 TB pretraining pipeline runs next to
dedup/quality filtering (Rae et al. 2021 "Gopher" §A1.1 repetition
filters; open-web pipeline decontamination against eval benchmarks).

Scale design, per operator:

* ``decontaminate_ngram`` — contamination = sharing ≥1 word n-gram with
  a benchmark set. Both sides explode to (id, shingle) rows and meet in
  an equi-join on the shingle string; the benchmark side of a real run
  is tiny (eval sets ≪ corpus), so AQE turns the join into a broadcast.
  The corpus' exploded shingles never aggregate anywhere — one shuffle,
  output ∝ contaminated docs. Nothing is quadratic in corpus size.
* ``repetition_profile`` — pure per-document map arithmetic on split
  lines (built-in functions only, whole-stage codegen, no shuffle).
* ``scrub_pii`` — regexp_replace/regexp_count chains, also pure map.

Everything is built-ins — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .linking import shingles_from_tokens, tokens_of


def decontaminate_ngram(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per contaminated document: how many distinct benchmark n-grams it
    contains.

    Output: (id, n_hits) — one row per corpus document sharing at least
    one word ``n``-gram with any benchmark document. Filter the corpus
    with a left-anti join against this frame (see
    :func:`drop_contaminated`).

    The benchmark's shingles are de-duplicated *before* the join
    (distinct on the small side), so a phrase appearing in many
    benchmark docs still contributes one join row per corpus occurrence.
    """
    corpus_sh = docs.select(
        F.col(id_col).alias("id"), tokens_of(F.col(text_col)).alias("toks")
    ).select(
        "id",
        F.explode(F.array_distinct(shingles_from_tokens(F.col("toks"), n))).alias("s"),
    )
    bench_sh = (
        benchmark.select(tokens_of(F.col(text_col)).alias("toks"))
        .select(F.explode(F.array_distinct(shingles_from_tokens(F.col("toks"), n))).alias("s"))
        .distinct()
    )
    return (
        corpus_sh.join(bench_sh, "s")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )


def drop_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """The corpus minus every document flagged by
    :func:`decontaminate_ngram` (left-anti on the id)."""
    hits = decontaminate_ngram(docs, benchmark, id_col, text_col, n)
    return docs.join(
        hits.select(F.col("id").alias(id_col)), id_col, "left_anti"
    )


def _lines(text: Column) -> Column:
    """Non-empty lines of a document (repetition is measured over real
    content lines; blank separators are layout, not text)."""
    return F.filter(F.split(text, "\n"), lambda l: l != F.lit(""))


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Gopher-style within-document repetition measures.

    Output per doc: (id, n_lines, uniq_line_ratio, dup_line_char_ratio,
    max_line_repeat) where

    * ``uniq_line_ratio``     = distinct lines / lines,
    * ``dup_line_char_ratio`` = chars in occurrences beyond a line's
      first / total line chars (the Gopher "fraction of characters in
      duplicate lines"),
    * ``max_line_repeat``     = occurrence count of the most-repeated
      line.

    One explode + one groupBy on (id, line) — repeats aggregate
    map-side; no text leaves its partition except the grouped
    (id, line, count) rows. Empty docs keep ratio 1.0 / 0.0 sentinels
    so downstream threshold filters never divide by zero.
    """
    ln = df.select(
        F.col(id_col).alias("id"), F.explode(_lines(F.col(text_col))).alias("line")
    )
    per_line = ln.groupBy("id", "line").agg(F.count("*").alias("c"))
    agg = per_line.groupBy("id").agg(
        F.sum("c").alias("n_lines"),
        F.count("*").alias("n_uniq"),
        F.sum((F.col("c") - 1) * F.length("line")).alias("dup_chars"),
        F.sum(F.col("c") * F.length("line")).alias("tot_chars"),
        F.max("c").alias("max_line_repeat"),
    )
    out = agg.select(
        "id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.round(F.col("n_uniq") / F.col("n_lines"), 6).alias("uniq_line_ratio"),
        F.when(F.col("tot_chars") > 0, F.round(F.col("dup_chars") / F.col("tot_chars"), 6))
        .otherwise(F.lit(0.0)).alias("dup_line_char_ratio"),
        F.col("max_line_repeat").cast("long").alias("max_line_repeat"),
    )
    # docs with zero non-empty lines still get a row
    # NULL text: _lines(null) is null and size(null) is not 0, so
    # coalesce to an empty array — null-text docs are zero-line docs and
    # keep the promised sentinel row.
    empties = (
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(
                _lines(F.col(text_col)), F.array().cast("array<string>")
            ).alias("ls"),
        )
        .where(F.size("ls") == 0)
        .select(
            "id",
            F.lit(0).cast("long").alias("n_lines"),
            F.lit(1.0).alias("uniq_line_ratio"),
            F.lit(0.0).alias("dup_line_char_ratio"),
            F.lit(0).cast("long").alias("max_line_repeat"),
        )
    )
    return out.unionByName(empties)


def quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
) -> DataFrame:
    """The actual keep/drop decision of a curation pipeline: Gopher-style
    hard gates over the one-pass ``textstats.text_profile`` metrics.

    Output: (id, n_tokens, quality, keep) — still a pure map (the
    profile shuffles nothing); filter the corpus with
    ``df.join(gate.where("keep"), ...)`` or stream the booleans to a
    labels table for audit. Thresholds are explicit parameters so the
    production configuration is value-checkable (the driver's
    `quality_gate` oracle applies the identical predicate in SQL).
    """
    from .textstats import text_profile

    prof = text_profile(df, id_col, text_col)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("quality") >= min_quality)
    )
    return prof.select("id", "n_tokens", "quality", keep.alias("keep"))


# PII patterns — deliberately simple, deterministic, and expressible
# identically in Java regex (Spark) and RE2 (DuckDB): no backrefs, no
# lookaround, no possessive quantifiers.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def scrub_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Redact emails / IPv4s / US-style phone numbers with typed
    placeholder tokens, counting each.

    Output: (id, clean_text, n_emails, n_ips, n_phones). Order matters:
    emails first (an address can contain digit runs), then IPs, then
    phones — each pass runs on the previous pass's output so a span is
    counted exactly once.
    """
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(EMAIL_RE))
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(IPV4_RE))
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PHONE_RE))
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("id"),
        t3.alias("clean_text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )
