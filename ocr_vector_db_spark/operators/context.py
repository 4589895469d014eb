"""Parent-context expansion.

Reference: ContextExpander (retrieval/context.py:52-119) — collect unique
parent_ids from search results, fetch `docstore_parent` rows, left-attach
content/metadata (a missing parent keeps the result row without context).

Spark shape: a left broadcast join — the results side is top-k (≤100 rows)
and the parents side is keyed; broadcasting the *results* onto the parents
scan (or the parents when they're the small side) avoids any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_context(
    results: DataFrame,
    parents: DataFrame,
    parent_id_col: str = "parent_id",
    parents_id_col: str = "id",
    content_col: str = "content",
    preview_chars: int | None = None,
) -> DataFrame:
    """Left-join parent content onto results as `parent_content`
    (+ optional fixed-length preview, reference formats 500/800 chars)."""
    p = parents.select(
        F.col(parents_id_col).alias("__pid"),
        F.col(content_col).alias("parent_content"),
    )
    out = results.join(
        F.broadcast(p), results[parent_id_col] == F.col("__pid"), "left"
    ).drop("__pid")
    if preview_chars:
        out = out.withColumn(
            "parent_preview", F.substring(F.col("parent_content"), 1, preview_chars)
        )
    return out
