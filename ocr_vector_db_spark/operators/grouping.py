"""Result grouping / ranking / post-search dedup.

Reference semantics: retrieval/grouping.py — group_by_parent/view/language
(:32-75), deduplicate_by_content (:78-94, key = content), top_n_per_parent
(:96-118, keeps similarity order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedupe_by_content(
    df: DataFrame,
    content_col: str = "content",
    order_col: str = "similarity",
    id_col: str = "fragment_id",
) -> DataFrame:
    """Keep the best-ranked row per distinct content (reference keeps the
    first in similarity order; ties broken by id for determinism)."""
    w = Window.partitionBy(content_col).orderBy(F.desc(order_col), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str = "similarity",
    id_col: str = "fragment_id",
    descending: bool = True,
) -> DataFrame:
    order = [F.desc(order_col) if descending else F.asc(order_col), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= n)
    )


def group_results(
    df: DataFrame, key_col: str, content_col: str = "content", order_col: str = "similarity"
) -> DataFrame:
    """Bucket results by key, results kept as a similarity-ordered list —
    group_by_parent/view/language collapse to one operator parameterized by
    the key column."""
    return df.groupBy(key_col).agg(
        F.count("*").alias("n_results"),
        F.max(order_col).alias("best_similarity"),
        F.sort_array(
            F.collect_list(F.struct(F.col(order_col), F.col(content_col))), asc=False
        ).alias("results"),
    )
