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
        lexical_index=None,
        ivf_index=None,
        index_id_col: str = "fragment_id",
    ):
        self.embeddings = embeddings
        self.parents = parents
        self.self_query = self_query
        self.use_optimizer = use_optimizer
        self.dim = dim
        self.embedder = embedder
        # persisted serving indexes (operators/lexical_index.LexicalIndex /
        # operators/ann_index.IVFIndex); when wired, retrieve_hybrid serves
        # from the partition-pruned index layouts instead of corpus rescans
        self.lexical_index = lexical_index
        self.ivf_index = ivf_index
        # id column name INSIDE the persisted indexes (the CLI `index`
        # command stores fragment ids under `vec_id`); values are fragment
        # ids either way, so fused ids join back on fragment_id
        self.index_id_col = index_id_col

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

    def retrieve_hybrid(
        self,
        query: str,
        top_k: int = 10,
        k_each: int | None = None,
        fuse_k: int = 60,
        nprobe: int | None = None,
    ) -> DataFrame:
        """Sparse (BM25) + dense (cosine) retrieval fused by RRF.

        Serves from the persisted indexes when both are wired
        (`LexicalIndex` postings buckets + `IVFIndex` cluster partitions —
        partition-pruned reads, no corpus rescan; the reference's GIN+HNSW
        serving shape), otherwise falls back to the scan-path formulations
        (`bm25_topk` + brute-force dense). Both paths fuse identically —
        q102 vs q90 hold the oracle-equality proof.

        Returns (id, rrf, n_systems, fused_rank) limited to `top_k`; join
        back to the store on id for display columns."""
        from pyspark.sql import functions as F

        from ocr_vector_db_spark.functions.vector import (
            cosine_similarity_col,
            embed_text,
        )
        from ocr_vector_db_spark.operators import retrieval

        k_each = k_each or max(top_k * 2, top_k)
        terms = [t for t in query.lower().split() if t]
        embedder = self.embedder or embed_text
        qv = embedder(query, self.dim)
        if self.lexical_index is not None and self.ivf_index is not None:
            fused = retrieval.hybrid_indexed(
                self.lexical_index, self.ivf_index, terms, qv,
                k_each=k_each, fuse_k=fuse_k, nprobe=nprobe,
                id_col=self.index_id_col,
            )
        else:
            sim = F.round(
                cosine_similarity_col(
                    F.col("embedding"), F.lit(qv).cast("array<double>")
                ),
                6,
            )
            dense = (
                self.embeddings.select(
                    F.col("fragment_id").alias("id"), sim.alias("sim")
                )
                .orderBy(F.desc("sim"), F.asc("id"))
                .limit(k_each)
                .withColumn(
                    "rank",
                    F.row_number()
                    .over(retrieval.bounded_window(
                        F.col("sim"), F.desc("sim"), F.asc("id")
                    ))
                    .cast("bigint"),
                )
            )
            lex = retrieval.bm25_topk(
                self.embeddings, terms, k=k_each,
                id_col="fragment_id", text_col="content",
            )
            fused = retrieval.rrf_fuse({"dense": dense, "lex": lex}, k=fuse_k)
        return fused.orderBy("fused_rank").limit(top_k)
