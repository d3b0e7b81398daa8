"""Structured Streaming extract: file source → parse → parquet sinks,
drained with availableNow; results must equal the batch path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mentor_rdf_parsers_spark.operators.extract import extract_triples, split_extract
from mentor_rdf_parsers_spark.schemas import DOCUMENTS
from mentor_rdf_parsers_spark.sources.fixtures import load_fixture_documents
from mentor_rdf_parsers_spark.streaming.extract_stream import start_extract_stream


def test_stream_extract_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "stream_out")
    docs = load_fixture_documents(spark, syntaxes=["ntriples"]).persist()
    docs.write.parquet(in_dir)

    q = start_extract_stream(spark, in_dir, out_dir, available_now=True)
    q.awaitTermination(300)

    streamed = spark.read.parquet(os.path.join(out_dir, "triples"))
    batch_triples, batch_errors = split_extract(extract_triples(docs))
    assert streamed.count() == batch_triples.count() > 0
    # value-level equality, not just counts
    diff = streamed.select("doc_id", "s", "p", "o").exceptAll(
        batch_triples.select("doc_id", "s", "p", "o")
    )
    assert diff.count() == 0
    errs = spark.read.parquet(os.path.join(out_dir, "errors"))
    assert errs.count() == batch_errors.count() > 0

    # restart with no new files: checkpoint prevents reprocessing
    q2 = start_extract_stream(spark, in_dir, out_dir, available_now=True)
    q2.awaitTermination(300)
    assert spark.read.parquet(os.path.join(out_dir, "triples")).count() == \
        batch_triples.count()
    docs.unpersist()
