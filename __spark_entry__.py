"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The inventory lives in ocr_vector_db_spark.plans.inventory; this module is
the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's full search
    path (embed query → KNN top-k → dedupe → parent-context join) over the
    synthetic embeddings/documents tables."""
    from pyspark.sql import functions as F

    from ocr_vector_db_spark.operators import grouping, knn
    from ocr_vector_db_spark.operators.context import expand_context
    from ocr_vector_db_spark.session import load_table

    sf_dir = "/root/testdata/sf0.001"
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    top = knn.knn_brute_force(emb, qv, 10)
    deduped = grouping.dedupe_by_content(top, content_col="label", id_col="vec_id")
    parents = docs.select(
        F.col("doc_id").alias("__pid"),
        F.substring("text", 1, 120).alias("parent_preview"),
        F.col("lang"),
        F.col("source"),
    )
    _ = expand_context  # full-context variant of the same join
    return (
        deduped.join(F.broadcast(parents), deduped["vec_id"] == F.col("__pid"), "left")
        .select("vec_id", "label", "similarity", "lang", "source", "parent_preview")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (and the LLM-
    pipeline extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    from ocr_vector_db_spark.plans.inventory import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry (omitted only
    for genuinely non-SQL-expressible ops → driver does a rows-only check)."""
    from ocr_vector_db_spark.plans.inventory import ORACLES

    return dict(ORACLES)
