"""Streaming exact deduplication over a document stream.

The streaming twin of ``operators.dedup.dedup_exact`` for continuous
ingest (no reference counterpart — the reference is single-document).
Design for unbounded input:

* dedup state must be EVICTABLE: a plain ``dropDuplicates`` on the
  digest keeps every digest ever seen in state forever, which at a
  100 TB/day ingest rate is an unbounded state store.
  ``dropDuplicatesWithinWatermark`` bounds state to the watermark
  horizon — duplicates arriving within the horizon are suppressed
  in-stream, state older than the watermark is dropped by the engine.
* only ``(digest, id, ts)`` flows through the stateful operator — the
  text itself is digested map-side and never enters the state store
  (the same "text never shuffles" rule as the batch operator).
* cross-horizon duplicates (a copy arriving a week later) are out of
  scope for the stream by construction; the emitted stream appends to
  a digest-keyed table and the batch ``dedup_exact`` compaction
  reconciles them — the standard cheap-stream + exact-batch split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.linking import normalize_key


def dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    normalized: bool = True,
) -> DataFrame:
    """Streaming DataFrame of documents → first-seen row per content
    digest within the watermark horizon.

    Output: (digest, id, ts) — one row per distinct (normalized) text;
    which duplicate wins is arrival order (streams have no global
    "min id" until compaction).

    Null-text documents are dropped before digesting: md5(NULL) = NULL
    and ``dropDuplicatesWithinWatermark`` treats NULL as one key, so
    without the filter every null-text doc inside the horizon would
    collapse into a single emitted row. A caller who wants null-text
    docs passed through should route them around the dedup
    (``docs.where(col(text_col).isNull())`` unioned downstream).
    """
    docs = docs.where(F.col(text_col).isNotNull())
    key = normalize_key(F.col(text_col)) if normalized else F.col(text_col)
    digested = docs.select(
        F.md5(key).alias("digest"),
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
    )
    return digested.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )
