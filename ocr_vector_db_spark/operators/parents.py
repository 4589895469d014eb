"""Parent-context synthesis and legacy page/section parent assignment.

Reference semantics:
- Parent synthesis (api/use_cases/ingest.py:282-318): per concept, order
  fragments by (view-rank, order), wrap code fragments in ```lang fences,
  join with blank lines, truncate to `parent_context_limit` (2000 chars).
  Spark shape: sort_array(collect_list(struct)) + concat_ws + substring —
  one hash aggregation, fully JVM-side (no applyInPandas needed).
- Page/section forward-fill (app/parents.py:47-92): running assignment of
  the last seen page/section marker over document order — the classic
  last(..., ignorenulls) window with an unbounded-preceding frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# text first, then code, then the visual views (mirrors the reference's
# view-order map in parent synthesis).
VIEW_RANK = {"text": 0, "code": 1, "table": 2, "figure": 3, "caption": 4, "image": 5}


def _view_rank_col(view):
    expr = F.lit(9)
    for v, r in VIEW_RANK.items():
        expr = F.when(view == v, F.lit(r)).otherwise(expr)
    return expr


def synthesize_parents(
    fragments: DataFrame,
    concept_col: str = "concept_id",
    limit_chars: int = 2000,
) -> DataFrame:
    """(concept_id, content) — the synthesized parent context per concept."""
    rendered = F.when(
        F.col("view") == "code",
        F.concat(
            F.lit("```"),
            F.coalesce(F.col("language"), F.lit("")),
            F.lit("\n"),
            F.col("content"),
            F.lit("\n```"),
        ),
    ).otherwise(F.col("content"))

    frag = fragments.select(
        F.col(concept_col),
        F.struct(
            _view_rank_col(F.col("view")).alias("vr"),
            F.col("order").alias("o"),
            rendered.alias("txt"),
        ).alias("s"),
    )
    return (
        frag.groupBy(concept_col)
        .agg(F.sort_array(F.collect_list("s")).alias("parts"))
        .select(
            F.col(concept_col).alias("id"),
            F.substring(
                F.array_join(F.transform("parts", lambda p: p["txt"]), "\n\n"),
                1,
                limit_chars,
            ).alias("content"),
        )
    )


def forward_fill(
    df: DataFrame,
    fill_col: str,
    partition_col: str = "document_id",
    order_col: str = "order",
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill the last non-null value of `fill_col` in document order."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col or fill_col, F.last(fill_col, ignorenulls=True).over(w))


def assign_parent_by_page_section(
    segments: DataFrame,
    mode: str = "page_section",
    document_col: str = "document_id",
    order_col: str = "order",
) -> DataFrame:
    """Legacy parent-id derivation: forward-filled page and/or section markers
    keyed into a parent id (app/parents.py:47-92 `page|section|page_section`)."""
    df = forward_fill(segments, "page", document_col, order_col, "cur_page")
    df = forward_fill(df, "section", document_col, order_col, "cur_section")
    if mode == "page":
        key = F.concat_ws("-", F.col(document_col), F.lit("p"), F.col("cur_page"))
    elif mode == "section":
        key = F.concat_ws("-", F.col(document_col), F.lit("s"), F.col("cur_section"))
    else:
        key = F.concat_ws(
            "-", F.col(document_col), F.lit("p"), F.col("cur_page"), F.lit("s"), F.col("cur_section")
        )
    return df.withColumn("parent_key", key)
