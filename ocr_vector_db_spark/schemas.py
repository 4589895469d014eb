"""Entity-table schemas (explicit StructTypes).

Mirrors the reference's four-level hierarchy Document → Concept → Fragment →
Embedding (domain/entities.py:1-163, docs/ARCHITECTURE.md §hierarchy) plus the
parent docstore (storage/schema.py:127-164) and the ingestion intermediates
RawSegment / UnitizedSegment (ingestion/models.py:7-37).

Metadata travels as a typed map<string,string>; hot filter keys (view, lang,
parent_id) are promoted to real columns so Catalyst can push predicates and
prune partitions — the Spark analogue of the reference's expression BTREE
indexes on cmetadata keys (storage/schema.py:93-118).
"""

from __future__ import annotations

from pyspark.sql import types as T

VIEWS = ["text", "code", "image", "table", "figure", "caption"]

META = T.MapType(T.StringType(), T.StringType())
VECTOR = T.ArrayType(T.DoubleType())

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),          # md5(source_path)
    T.StructField("source_path", T.StringType(), False),
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("metadata", META, True),
])

CONCEPT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),           # md5(doc|unit)[:16]
    T.StructField("document_id", T.StringType(), False),  # HIER-002: never null
    T.StructField("order", T.IntegerType(), False),
    T.StructField("content", T.StringType(), True),       # synthesized parent ctx
    T.StructField("metadata", META, True),
])

FRAGMENT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),
    T.StructField("concept_id", T.StringType(), False),   # HIER-003: immutable
    T.StructField("content", T.StringType(), False),
    T.StructField("view", T.StringType(), False),         # ∈ VIEWS
    T.StructField("language", T.StringType(), True),
    T.StructField("order", T.IntegerType(), False),
    T.StructField("metadata", META, True),
])

EMBEDDING_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),       # "doc:"+md5(pid|view|lang|content)
    T.StructField("fragment_id", T.StringType(), False),
    T.StructField("parent_id", T.StringType(), False),    # = fragment.concept_id
    T.StructField("view", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("order", T.IntegerType(), True),
    T.StructField("content", T.StringType(), False),
    T.StructField("embedding", VECTOR, False),
])

PARENT_SCHEMA = T.StructType([
    T.StructField("id", T.StringType(), False),           # = concept id
    T.StructField("content", T.StringType(), True),
    T.StructField("metadata", META, True),
    T.StructField("updated_at", T.TimestampType(), True),
])

RAW_SEGMENT_SCHEMA = T.StructType([
    T.StructField("document_id", T.StringType(), False),
    T.StructField("source_path", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),         # text|code|image
    T.StructField("content", T.StringType(), False),
    T.StructField("language", T.StringType(), True),
    T.StructField("order", T.IntegerType(), False),
    T.StructField("page", T.IntegerType(), True),
    T.StructField("bbox", T.ArrayType(T.DoubleType()), True),
])

UNITIZED_SEGMENT_SCHEMA = T.StructType(
    RAW_SEGMENT_SCHEMA.fields
    + [
        T.StructField("unit_id", T.StringType(), False),
        T.StructField("unit_role", T.StringType(), False),
    ]
)
