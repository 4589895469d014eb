"""Query plan + retrieval pipeline.

The reference's search lifecycle (SURVEY §3.2, retrieval/pipeline.py:90-181):
filters extracted from the NL query (driver-side) → QueryPlan(embedding,
filters, k) → KNN SQL → content dedupe → parent context join. Here the plan
object is built on the driver and the execution is one declarative DataFrame
chain, so Catalyst pushes the view/lang filters into the scan and the top-k
compiles to TakeOrderedAndProject.

top_k clamping mirrors retrieval/query.py:17,47-52 (default 10, cap 100) and
api/validators.py:62-110 (query ≤ 10000 chars, view enum, 1 ≤ k ≤ 1000).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.vector import embed_text
from ocr_vector_db_spark.operators import grouping, knn
from ocr_vector_db_spark.operators.context import expand_context
from ocr_vector_db_spark.schemas import VIEWS

DEFAULT_TOP_K = 10
MAX_TOP_K = 100
API_MAX_TOP_K = 1000
MAX_QUERY_CHARS = 10000


class ValidationError(ValueError):
    pass


def validate_request(query: str, view: str | None, top_k: int) -> None:
    if not query or not query.strip():
        raise ValidationError("query must be non-empty")
    if len(query) > MAX_QUERY_CHARS:
        raise ValidationError(f"query exceeds {MAX_QUERY_CHARS} chars")
    if view is not None and view not in VIEWS:
        raise ValidationError(f"view must be one of {VIEWS}")
    if not (1 <= top_k <= API_MAX_TOP_K):
        raise ValidationError(f"top_k must be in [1, {API_MAX_TOP_K}]")


@dataclass
class QueryPlan:
    query: str
    embedding: list[float]
    view: str | None = None
    lang: str | None = None
    top_k: int = DEFAULT_TOP_K
    expand_context: bool = True
    extra_filters: dict[str, str] = field(default_factory=dict)

    @classmethod
    def build(
        cls,
        query: str,
        view: str | None = None,
        lang: str | None = None,
        top_k: int = DEFAULT_TOP_K,
        expand_context: bool = True,
        embedder=embed_text,
        dim: int = 64,
    ) -> "QueryPlan":
        validate_request(query, view, top_k)
        return cls(
            query=query,
            embedding=embedder(query, dim),
            view=view,
            lang=lang,
            top_k=min(int(top_k), MAX_TOP_K),
            expand_context=expand_context,
        )


def search(
    embeddings: DataFrame,
    plan: QueryPlan,
    parents: DataFrame | None = None,
) -> DataFrame:
    """Execute a QueryPlan: filter → score → top-k → dedupe → context join.

    The filters are plain column predicates BEFORE scoring, so when the
    embeddings table is partitioned by (view, lang) they become partition
    pruning, and row-group skipping otherwise — the Spark analogue of the
    reference's metadata-filter pushdown (retrieval/search.py:89-97)."""
    df = embeddings
    if plan.view:
        df = df.filter(F.col("view") == plan.view)
    if plan.lang:
        df = df.filter(F.col("lang") == plan.lang)
    for k, v in plan.extra_filters.items():
        df = df.filter(F.col(k) == v)

    top = knn.knn_brute_force(df, plan.embedding, plan.top_k, id_col="fragment_id")
    top = grouping.dedupe_by_content(top, content_col="content", id_col="fragment_id")
    if plan.expand_context and parents is not None:
        top = expand_context(top, parents, preview_chars=800)
    # the dedupe window + context join scramble row order — restore the
    # similarity ranking the caller (and the reference API) expects
    return top.orderBy(F.desc("similarity"), "fragment_id")
