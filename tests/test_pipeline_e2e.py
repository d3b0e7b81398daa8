"""End-to-end pipeline: extract → link → canonicalize → materialize with
stage resume, lineage metrics, error quarantine and the span-sequence
invariant (BASELINE.json input_hint)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mentor_rdf_parsers_spark.operators.materialize import read_metrics
from mentor_rdf_parsers_spark.pipeline import run_pipeline, spans_roundtrip_check
from mentor_rdf_parsers_spark.schemas import DOCUMENTS
from mentor_rdf_parsers_spark.sources.testdata import (
    SOURCE_NS,
    documents_as_rdf_docs,
    load_table,
)

SF = "/root/testdata/sf0.001"


def _dictionary(spark):
    return (
        load_table(spark, SF, "documents")
        .select("source").distinct()
        .select(
            F.col("source").alias("alias"),
            F.concat(F.lit(SOURCE_NS), F.col("source")).alias("entity"),
        )
    )


def test_pipeline_stages_and_resume(spark, tmp_path):
    out = str(tmp_path / "kg")
    docs = documents_as_rdf_docs(spark, SF)
    stats = run_pipeline(spark, docs, out, dictionary=_dictionary(spark))
    assert stats["triples"] == 2000          # 4 preds × 500 docs
    assert stats["errors"] == 0
    assert stats["linked"] == 500            # one source literal per doc
    assert stats["canonical"] == stats["triples"]  # no sameAs edges → no collapse
    assert stats["media"] == 167  # every 3rd doc carries a media span

    # lineage metrics: totals reconcile with the stage row count
    m = read_metrics(spark, out, "triples")
    assert m.agg(F.sum("triple_count")).collect()[0][0] == 2000

    # resume: stage dirs untouched on second run (same _SUCCESS mtimes)
    marker = os.path.join(out, "triples", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    stats2 = run_pipeline(spark, docs, out, dictionary=_dictionary(spark))
    assert stats2["triples"] == 2000
    assert os.path.getmtime(marker) == mtime


def test_pipeline_quarantines_bad_docs(spark, tmp_path):
    out = str(tmp_path / "kg_bad")
    rows = [
        ("good", [("text", "<urn:a> <urn:b> <urn:c> .\n", None, 0)], "ntriples", None),
        ("bad", [("text", "this is not rdf at all ~~~\n", None, 0)], "ntriples", None),
    ]
    docs = spark.createDataFrame(rows, DOCUMENTS)
    stats = run_pipeline(spark, docs, out)
    assert stats["triples"] == 1
    assert stats["errors"] >= 1


def test_span_sequence_invariant(spark):
    docs = documents_as_rdf_docs(spark, SF)
    assert spans_roundtrip_check(docs) == 0
    # media spans present and interleaved on every 3rd doc
    with_media = docs.where(
        F.exists("spans", lambda s: s["kind"] == "media")
    ).count()
    assert with_media == docs.count() // 3 + (1 if docs.count() % 3 else 0)
