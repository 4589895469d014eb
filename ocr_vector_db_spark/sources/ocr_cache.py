"""OCR result cache: skip re-OCR of already-processed content.

The reference caches Gemini Vision OCR results in `.ocr.json` sidecar files
keyed by file hash (ingestion/parsers/pymupdf_parser.py:825-878) so a
re-ingest never re-pays the OCR call. The distributed equivalent is a
checkpoint TABLE keyed by content hash:

  lookup: assets LEFT ANTI JOIN cache ON content_hash  →  only cache
          misses reach the (expensive, rate-limited) OCR provider;
  fill:   new results APPEND to the cache table (idempotent — the hash key
          dedupes on read, first-writer-wins like the reference's
          cache-file check);
  serve:  hits come straight from the cache via an equi-join.

At 100 TB the cache join is a plain hash join on a 32-char key; the anti
join prunes the provider fan-out to genuinely-new bytes, which is the
entire economics of re-crawling a mostly-unchanged corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

OCR_CACHE_SCHEMA = T.StructType([
    T.StructField("content_hash", T.StringType(), False),
    T.StructField("ocr_text", T.StringType(), True),
    T.StructField("provider", T.StringType(), True),
])


def _stub_ocr(data: bytes) -> str:
    """Deterministic stand-in for the Vision-OCR call (the real body wraps
    a rate-limited external API exactly like operators/embedding_provider)."""
    import hashlib

    return f"ocr:{hashlib.md5(data).hexdigest()[:12]}"


def read_cache(spark: SparkSession, cache_path: str) -> DataFrame:
    """Cache table (empty-safe). Appends may have written the same hash
    twice (two concurrent misses); first-writer-wins on read."""
    try:
        df = spark.read.schema(OCR_CACHE_SCHEMA).parquet(cache_path)
    except Exception:
        return spark.createDataFrame([], OCR_CACHE_SCHEMA)
    return df.dropDuplicates(["content_hash"])


def ocr_with_cache(
    spark: SparkSession,
    assets: DataFrame,
    cache_path: str,
    ocr=_stub_ocr,
    provider_name: str = "stub",
) -> DataFrame:
    """(asset_id, content_hash, ocr_text, from_cache) for every asset,
    invoking `ocr` only for content hashes absent from the cache table, and
    appending those results so the next run is a pure join."""
    hashed = assets.select(
        "asset_id", F.md5(F.col("data")).alias("content_hash"), "data"
    )
    cache = read_cache(spark, cache_path)

    misses = hashed.join(cache, "content_hash", "left_anti")

    out_schema = T.StructType([
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("ocr_text", T.StringType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "content_hash": pdf["content_hash"],
                    "ocr_text": [ocr(bytes(d)) for d in pdf["data"]],
                }
            )

    # localCheckpoint materializes the provider calls exactly once; the
    # append and the result join both read the checkpointed rows. (Do NOT
    # re-read cache_path here instead: a pre-append and a post-append scan
    # of the same path in one plan get collapsed by Spark's scan reuse, and
    # the stale listing wins — the new rows would join as nulls.)
    new = (
        misses.select("content_hash", "data")
        .dropDuplicates(["content_hash"])
        .mapInPandas(run, out_schema)
        .withColumn("provider", F.lit(provider_name))
        .localCheckpoint()
    )
    new.write.mode("append").parquet(cache_path)

    hits = (
        hashed.drop("data")
        .join(cache, "content_hash")
        .withColumn("from_cache", F.lit(True))
    )
    miss_out = (
        misses.select("asset_id", "content_hash")
        .join(new, "content_hash", "left")
        .withColumn("from_cache", F.lit(False))
    )
    cols = ["asset_id", "content_hash", "ocr_text", "provider", "from_cache"]
    return hits.select(cols).unionByName(miss_out.select(cols))
