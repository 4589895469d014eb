"""RetrievalPipeline: the staged fallback chain of the reference
(retrieval/pipeline.py:90-181):

  Stage 0  self-query — a pluggable filter-extractor (LLM in the reference,
           retrieval/self_query.py) turns the NL query into {view, lang};
           any failure falls through silently;
  Stage 0b query optimizer — deterministic keyword/hint rewrite
           (plans/query_optimizer.py); hints only fill UNSET filters;
  Stage 1  interpret — QueryPlan.build (validation, clamping, embedding);
  Stage 2  vector search (filter → score → top-k);
  Stage 3  dedupe by content + parent-context expansion.

Execution is a single declarative DataFrame chain per request; the stages
above are driver-side plan construction, exactly like the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from ocr_vector_db_spark.plans import query_optimizer
from ocr_vector_db_spark.plans.query import QueryPlan, search

# A self-query extractor: query → {"view": ..., "lang": ...} or raises.
SelfQueryFn = Callable[[str], dict]


def heuristic_self_query(query: str) -> dict:
    """Deterministic self-query: reuse the optimizer's hint heuristics as the
    filter extractor (the reference's non-LLM fallback contract)."""
    opt = query_optimizer.optimize(query)
    filters: dict = {}
    if opt.view_hint:
        filters["view"] = opt.view_hint
    if opt.language_hint:
        filters["lang"] = opt.language_hint
    return filters


class RetrievalPipeline:
    def __init__(
        self,
        embeddings: DataFrame,
        parents: DataFrame | None = None,
        self_query: SelfQueryFn | None = heuristic_self_query,
        use_optimizer: bool = True,
        dim: int = 64,
        embedder=None,
    ):
        self.embeddings = embeddings
        self.parents = parents
        self.self_query = self_query
        self.use_optimizer = use_optimizer
        self.dim = dim
        self.embedder = embedder

    def retrieve(
        self,
        query: str,
        view: str | None = None,
        language: str | None = None,
        top_k: int = 10,
        expand_context: bool = True,
        deduplicate: bool = True,
        use_self_query: bool = True,
    ) -> DataFrame:
        search_query = query
        eff_view, eff_lang = view, language

        # Stage 0: self-query filter extraction (failure → fall through)
        if use_self_query and self.self_query is not None:
            try:
                filters = self.self_query(query) or {}
                eff_view = eff_view or filters.get("view")
                eff_lang = eff_lang or filters.get("lang")
            except Exception:
                pass

        # Stage 0b: keyword rewrite + hints fill unset filters only
        if self.use_optimizer:
            try:
                opt = query_optimizer.optimize(query)
                search_query = opt.rewritten
                eff_view = eff_view or opt.view_hint
                eff_lang = eff_lang or opt.language_hint
            except Exception:
                search_query = query

        # Stage 1: interpret
        kwargs = {"embedder": self.embedder} if self.embedder else {}
        plan = QueryPlan.build(
            search_query, view=eff_view, lang=eff_lang, top_k=top_k,
            expand_context=expand_context, dim=self.dim, **kwargs,
        )
        # Stages 2+3 execute as one DataFrame chain
        if not deduplicate:
            from ocr_vector_db_spark.operators import knn
            from ocr_vector_db_spark.operators.context import expand_context as ec
            from pyspark.sql import functions as F

            df = self.embeddings
            if plan.view:
                df = df.filter(F.col("view") == plan.view)
            if plan.lang:
                df = df.filter(F.col("lang") == plan.lang)
            top = knn.knn_brute_force(df, plan.embedding, plan.top_k, id_col="fragment_id")
            if expand_context and self.parents is not None:
                top = ec(top, self.parents, preview_chars=800)
            return top.orderBy(F.desc("similarity"), "fragment_id")
        return search(self.embeddings, plan, self.parents if expand_context else None)
