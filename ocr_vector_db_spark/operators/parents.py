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


def synthesize_parents_legacy(
    fragments: DataFrame,
    concept_col: str = "concept_id",
    max_chars: int = 2000,
) -> DataFrame:
    """Legacy parent synthesis (app/parents.py:94-108): header line (markdown
    heading / Chapter N / 제 N 장 / numbered section, uppercase-line
    fallback) + first caption + sentence-truncated body from pre_text (or all
    text) fragments, joined with blank lines and capped at `max_chars`.

    Header fallback and sentence truncation are per-group sequential logic →
    applyInPandas per concept (groups are tiny: one concept's fragments)."""
    import pandas as pd

    from ocr_vector_db_spark.functions.captions import (
        extract_caption, extract_header, first_sentences,
    )

    def per_concept(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("order")
        cid = pdf[concept_col].iloc[0]
        texts = [r.content for r in pdf.itertuples() if r.view == "text"]
        if not texts:
            texts = [r.content for r in pdf.itertuples()]
        header = next((h for t in texts if (h := extract_header(t))), None)
        caption = next((c for t in texts if (c := extract_caption(t))), None)
        pre = [r.content for r in pdf.itertuples() if getattr(r, "unit_role", "") == "pre_text"]
        body_src = "\n".join(pre) if pre else "\n".join(texts)
        body = first_sentences(body_src, max_chars=max(600, max_chars - 200)) if body_src else ""
        parts = [p for p in (header, caption, body) if p]
        content = "\n\n".join(parts) if parts else f"unit {cid}"
        return pd.DataFrame({"id": [cid], "content": [content[:max_chars]]})

    return fragments.groupBy(concept_col).applyInPandas(
        per_concept, "id string, content string"
    )
