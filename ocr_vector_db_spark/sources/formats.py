"""Structured document sources: JSONL / CSV / parquet round-trip.

The reference ingests loose files (api/cli/ingest.py:25-51) and stores rows
in Postgres; a 100 TB training-data pipeline instead receives document
corpora as JSONL or CSV drops. These readers normalize any of those into the
canonical ``documents`` schema (doc_id, text, lang, source, n_chars).

Scale rules baked in:
- explicit schemas, never ``inferSchema`` (inference is an extra full scan);
- JSONL stays single-line (splittable — every executor reads its own byte
  range; ``multiLine`` JSON is one-task-per-file and is deliberately not
  exposed);
- malformed rows are quarantined via PERMISSIVE mode + ``_corrupt_record``
  instead of failing the batch, and can be counted/inspected downstream;
- missing doc_id falls back to md5(source || text) — the same deterministic
  identity rule as ingest (functions/hashing.py), so re-drops are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOCUMENTS_SCHEMA", "read_documents_jsonl", "read_documents_csv", "write_documents"]

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

_RAW_FIELDS = DOCUMENTS_SCHEMA.fields + [
    T.StructField("_corrupt_record", T.StringType(), True)
]


def _normalize(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): fill derived columns, split off corrupt rows."""
    # Spark disallows queries that reference ONLY _corrupt_record from a raw
    # file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented pattern is
    # to persist the parsed batch first. Drops are ingested incrementally, so
    # the cache is one batch, not the whole corpus.
    df = df.cache()
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    good = (
        df.filter(F.col("_corrupt_record").isNull() & F.col("text").isNotNull())
        .withColumn(
            "doc_id",
            F.coalesce(
                F.col("doc_id"),
                # stable 54-bit id from content identity (positive, fits a long)
                F.conv(F.substring(F.md5(F.concat_ws("\x00", "source", "text")), 1, 13), 16, 10).cast("long"),
            ),
        )
        .withColumn("n_chars", F.coalesce(F.col("n_chars"), F.length("text").cast("long")))
        .withColumn("lang", F.coalesce(F.col("lang"), F.lit("und")))
        .select([f.name for f in DOCUMENTS_SCHEMA.fields])
    )
    return good, bad


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL document drop → (documents, quarantine). Splittable,
    schema-on-read, corrupt lines preserved verbatim for triage."""
    df = spark.read.schema(T.StructType(_RAW_FIELDS)).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    return _normalize(df)


def read_documents_csv(
    spark: SparkSession, path: str, *, header: bool = True, sep: str = ","
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV document drop → (documents, quarantine). Explicit schema;
    quoted multiline text fields are tolerated per-record."""
    df = (
        spark.read.schema(T.StructType(_RAW_FIELDS))
        .option("header", header)
        .option("sep", sep)
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return _normalize(df)


def write_documents(
    df: DataFrame, path: str, *, partition_by: str | None = "lang", max_records_per_file: int = 1_000_000
) -> None:
    """Canonical parquet sink: partitioned by a low-cardinality column and
    capped records-per-file so downstream scans get partition pruning AND
    bounded task sizes (no 10 GB files at 100 TB)."""
    w = df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)
