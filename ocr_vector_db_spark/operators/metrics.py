"""Data-quality metrics job.

Reference: storage/metrics.py:32-117 — total counts, missing-id counts,
short-content counts, duplicate doc_id groups (GROUP BY … HAVING COUNT>1),
view/lang distributions (GROUP BY + ORDER BY count DESC LIMIT n), samples.

Each reference query was a separate Postgres round-trip; here the scalar
metrics collapse into ONE scan with conditional aggregation (sum(when(...)))
— a single pass even at 100 TB — and the distributions are one groupBy each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_metrics(embeddings: DataFrame, short_content_chars: int = 10) -> DataFrame:
    """One-row DataFrame of scalar health metrics over the embeddings table."""
    return embeddings.agg(
        F.count("*").alias("total_rows"),
        F.sum(F.when(F.col("doc_id").isNull() | (F.col("doc_id") == ""), 1).otherwise(0)).alias("missing_doc_id"),
        F.sum(F.when(F.col("parent_id").isNull() | (F.col("parent_id") == ""), 1).otherwise(0)).alias("missing_parent_id"),
        F.sum(F.when(F.col("fragment_id").isNull() | (F.col("fragment_id") == ""), 1).otherwise(0)).alias("missing_fragment_id"),
        F.sum(F.when(F.length("content") < short_content_chars, 1).otherwise(0)).alias("short_content"),
        F.countDistinct("doc_id").alias("distinct_doc_ids"),
        F.countDistinct("parent_id").alias("distinct_parents"),
    )


def duplicate_groups(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Keys appearing more than once: (key, n) — HAVING COUNT(*)>1."""
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def distribution(df: DataFrame, key_col: str, limit: int = 20) -> DataFrame:
    """Top-N value distribution of a column (view/lang distributions)."""
    return (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.col(key_col))
        .limit(limit)
    )
