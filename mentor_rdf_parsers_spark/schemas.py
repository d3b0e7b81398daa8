"""Fixed StructType schemas for every engine table (FIXTURES.md).

Declared up front — the reference's schema is the RDF/JS interface
(SURVEY.md §1.5); ours is columnar and static so Catalyst can prune and
push down against it.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Pipeline input (BASELINE.json input_hint): interleaved text+media docs.
SPAN = StructType(
    [
        StructField("kind", StringType(), False),      # 'text' | 'media'
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), False),   # span order in doc
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN), False),
        # synthesis/routing extras (not part of the invariant)
        StructField("syntax", StringType(), True),     # ntriples|nquads|turtle|trig|n3
        StructField("expect", StringType(), True),     # eval|positive|negative
    ]
)

# Pipeline output (FIXTURES.md §3 + p_kind for N3 variable predicates).
TRIPLES = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("s_kind", StringType(), False),    # iri|bnode|var|literal
        StructField("s", StringType(), False),
        StructField("p_kind", StringType(), False),    # iri|var|bnode|literal
        StructField("p", StringType(), False),
        StructField("o_kind", StringType(), False),    # iri|bnode|literal|tripleterm|var
        StructField("o", StringType(), False),
        StructField("o_lang", StringType(), True),
        StructField("o_dt", StringType(), True),
        StructField("g_kind", StringType(), True),     # iri|bnode|None
        StructField("g", StringType(), True),
        StructField("s_off", IntegerType(), True),
        StructField("p_off", IntegerType(), True),
        StructField("o_off", IntegerType(), True),
    ]
)

# Quarantine side-output (src/syntax.ts:55-65 error channels).
ERRORS = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("stage", StringType(), False),     # lex|parse|semantic
        StructField("offset", IntegerType(), True),
        StructField("message", StringType(), True),
    ]
)

# Combined mapInPandas output: one Arrow stream carrying both, split after.
# Triple fields are nullable here because error records leave them empty.
EXTRACT = StructType(
    [StructField("rec", StringType(), False)]          # 't' | 'e'
    + [StructField(f.name, f.dataType, True) for f in TRIPLES.fields]
    + [
        StructField("stage", StringType(), True),
        StructField("err_offset", IntegerType(), True),
        StructField("message", StringType(), True),
    ]
)

# Checkpoint/resume bookkeeping (FIXTURES.md §5).
LINEAGE_METRICS = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("doc_count", LongType(), False),
        StructField("triple_count", LongType(), False),
        StructField("checksum", StringType(), False),
        StructField("snapshot_ts", TimestampType(), False),
    ]
)

EXTRACT_COLS = [f.name for f in EXTRACT.fields]
TRIPLE_COLS = [f.name for f in TRIPLES.fields]
ERROR_COLS = [f.name for f in ERRORS.fields]
