"""Structured Streaming variant of the extract stage.

The reference has no streaming surface (SURVEY.md §2.B note) — this is
the engine-side capability for continuously-arriving document batches:
`readStream` over a documents directory → the SAME fused parse
`mapInPandas` used by the batch path → `writeStream` parquet sinks for
triples and quarantined errors, with checkpointing for exactly-once
file-sink semantics.

Semantics notes:
* the parse UDF is stateless across documents, so it composes with
  streaming with no watermark; per-doc state lives inside one row.
* `Trigger.AvailableNow` drains whatever is present then stops — the
  batch-equivalent mode used in tests; production uses the default
  micro-batch trigger.
* the combined (rec='t'|'e') stream is split by two sinks reading one
  `foreachBatch` so the UDF runs once per micro-batch, not twice.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_triples, split_extract
from ..schemas import DOCUMENTS


def read_document_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def start_extract_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    available_now: bool = False,
    strict: bool = False,
):
    """documents parquet dir (streaming source) → {out}/triples,
    {out}/errors parquet sinks + {out}/_checkpoint. Returns the query."""
    docs = read_document_stream(spark, input_dir)
    extracted = extract_triples(docs, strict=strict)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        triples, errors = split_extract(batch_df)
        triples.write.mode("append").parquet(os.path.join(out_dir, "triples"))
        errors.write.mode("append").parquet(os.path.join(out_dir, "errors"))
        batch_df.unpersist()

    writer = (
        extracted.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_triple_rates(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 minute",
    ts_col: str = "ingest_ts",
):
    """Windowed triple-emission metrics over a documents stream that
    carries an ingest timestamp: tumbling-window doc counts with a
    10-minute watermark for late arrivals. Returns a streaming DF the
    caller writes (memory sink in tests)."""
    from pyspark.sql.types import StructField, StructType, TimestampType

    # StructType.add MUTATES the receiver — build a fresh schema instead
    schema = StructType(
        list(DOCUMENTS.fields) + [StructField(ts_col, TimestampType())]
    )
    docs = spark.readStream.schema(schema).parquet(input_dir)
    return (
        docs.withWatermark(ts_col, "10 minutes")
        .groupBy(F.window(F.col(ts_col), window), F.col("syntax"))
        .agg(F.count("*").alias("n_docs"))
    )
