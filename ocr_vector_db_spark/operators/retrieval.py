"""Hybrid retrieval: BM25 lexical scoring + reciprocal-rank fusion (RRF).

The reference retrieves purely by dense cosine (retrieval/search.py:89-116)
with a keyword optimizer that rewrites the query text but still searches by
embedding (retrieval/query_optimizer.py). A production RAG stack pairs that
dense ranking with a sparse lexical ranking (BM25, Robertson & Spärck Jones)
and fuses the two lists with reciprocal-rank fusion (Cormack et al., SIGIR'09)
— the standard hybrid-search recipe (Elasticsearch/Vespa/Weaviate all ship
exactly this pair). Both halves are pure built-in-expression DataFrame plans.

Scale shape:
  BM25: the candidate explode is pre-filtered to the query's own terms
        (array filter BEFORE explode), so the exploded relation is
        O(matching postings), not O(corpus tokens). Per-doc length and the
        corpus stats ride a 1-row broadcast cross join; the per-term df
        table (≤ |query| rows) is broadcast. One shuffle: the (doc, term)
        tf aggregate.
  RRF:  union of the K-row ranked lists → one hash agg on id. Input lists
        are already top-k (driver-bounded), so this is KB-scale regardless
        of corpus size.

Determinism contract: per-term/per-system contributions are rounded to 6 dp
and summed as DECIMAL(28,6) (order-independent), then cast back to double —
same convention as the inventory's `dsum`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.tfidf import words_col


def _dsum6(c: Column) -> Column:
    """Order-independent float sum: round 6 dp → exact decimal sum → double."""
    return F.sum(F.round(c, 6).cast("decimal(28,6)")).cast("double")


def bounded_window(anchor: Column, *order_cols: Column) -> Window:
    """Total-order window over a DRIVER-BOUNDED (top-k) relation.

    Semantically identical to ``Window.orderBy(...)`` but partitioned on a
    value that is 0 for every row (``coalesce(anchor*0, 0)``), which tells
    Spark the single-partition placement is deliberate — silencing the
    per-plan "No Partition Defined for Window operation" WindowExec warning
    that otherwise fires even when the input is k rows. A bare ``lit(0)``
    does NOT work: Catalyst constant-folds foldable partition expressions
    away, leaving an empty partition spec and the warning; deriving the
    constant from a column keeps it in the spec. ``pmod(xxhash64(anchor),
    1)`` is type-agnostic, null-safe (xxhash64 of NULL is a seed constant,
    never NULL) and fold-resistant: the previous ``coalesce(length(cast(
    anchor))*0, 0)`` formulation was simplified away whenever `anchor` was
    NON-NULLABLE (e.g. a count(*) output) — Catalyst's arithmetic
    simplification rewrites non-nullable ``e * 0`` to a literal, the
    foldable partition spec is then eliminated, and the WindowExec warning
    returns (observed on q131's n_hits anchor; harmless but noisy). No
    simplification rule rewrites ``pmod(hash, 1)``. `anchor` is any column
    of the relation (the score being ranked is the natural choice). Only
    ever use this AFTER a ``orderBy(...).limit(k)`` or equivalent bound; on
    an unbounded relation it is exactly the anti-pattern the warning exists
    for.

    Version note: if a future Spark learns to fold ``pmod(x, 1)``, the
    (harmless, driver-bounded) warning reappears — correctness is
    unaffected either way, and this helper is the place to re-derive a
    non-foldable constant."""
    return Window.partitionBy(
        F.pmod(F.xxhash64(anchor), F.lit(1))
    ).orderBy(*order_cols)


def _bm25_score_cols(k1: float, b: float) -> Column:
    """idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)) — Lucene's BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5))) over columns
    (tf, df, dl, n_docs, avgdl). The SINGLE definition of the scoring math:
    both the scan path below and the persisted-index path
    (`operators/lexical_index.py`) build their per-(doc, term) contributions
    from this expression, so the two formulations cannot drift."""
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return idf * tf_part


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bm25) for every document matching ≥1 query term.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)),
    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene's BM25 idf).

    dl = document length in tokens, avgdl/N from a 1-row broadcast stats
    join, df from a ≤|query|-row broadcast join. The only corpus-wide
    shuffle is the (doc, term) tf aggregate over pre-filtered postings.
    """
    terms = sorted(set(t.lower() for t in query_terms))
    base = docs.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("__ws")
    ).select(
        "id",
        F.size("__ws").alias("dl"),
        F.filter("__ws", lambda w: w.isin(terms)).alias("__hits"),
    )
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        base.select("id", "dl", F.explode("__hits").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(_dsum6(_bm25_score_cols(k1, b)).alias("bm25"))
        .select("id", F.round("bm25", 6).alias("bm25"))
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 (score desc, id asc) — TakeOrderedAndProject, no full sort."""
    scored = bm25_scores(docs, query_terms, **kwargs)
    return (
        scored.orderBy(F.desc("bm25"), F.asc("id"))
        .limit(k)
        .select(
            "id",
            "bm25",
            F.row_number()
            .over(bounded_window(F.col("bm25"), F.desc("bm25"), F.asc("id")))
            .cast("bigint")
            .alias("rank"),
        )
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of named ranked lists:
    rrf(d) = Σ_systems 1/(k + rank_s(d))  (Cormack et al., k=60).

    Returns (id, rrf, n_systems, fused_rank) ordered by (rrf desc, id) —
    ties broken on id so the fused ranking is total and reproducible.
    Inputs are top-k lists, so the union + single hash agg is KB-scale.
    """
    tagged = None
    for name, r in sorted(rankings.items()):
        t = r.select(
            F.col(id_col).alias("id"), F.col(rank_col).cast("double").alias("rank")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    fused = (
        tagged.groupBy("id")
        .agg(
            _dsum6(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("rrf"),
            F.count("*").alias("n_systems"),
        )
        .select("id", F.round("rrf", 6).alias("rrf"), "n_systems")
    )
    w = bounded_window(F.col("rrf"), F.desc("rrf"), F.asc("id"))
    return fused.withColumn("fused_rank", F.row_number().over(w).cast("bigint"))


def hybrid_indexed(
    lexical_index,
    ivf_index,
    query_terms: list[str],
    query_vector: list[float],
    k_each: int = 20,
    fuse_k: int = 60,
    nprobe: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval served from the PERSISTED indexes — the production
    twin of the scan-path bm25_topk + brute-force-dense + rrf_fuse combo
    (the reference's serving shape: GIN + HNSW behind one query,
    storage/schema.py:80-118).

    Sparse half: `LexicalIndex.search` — a partition-pruned read of the
    query terms' postings buckets. Dense half: `IVFIndex.search` — a
    partition-pruned read of the probed clusters. Neither half rescans the
    corpus; both are O(index slice), and the RRF fusion is a union of two
    driver-bounded k-row lists. `nprobe=None` probes every cluster: still
    served from the partitioned layout, and exactly equal to brute force
    (the oracle-parity setting); production sets nprobe « num_clusters."""
    lex = lexical_index.search(query_terms, k=k_each)
    dense_raw = ivf_index.search(
        query_vector, k_each, nprobe=nprobe or len(ivf_index.centroids),
        id_col=id_col,
    )
    dense = dense_raw.select(
        F.col(id_col).alias("id"), F.col("similarity").alias("sim")
    ).withColumn(
        "rank",
        F.row_number()
        .over(bounded_window(F.col("sim"), F.desc("sim"), F.asc("id")))
        .cast("bigint"),
    )
    return rrf_fuse({"dense": dense, "lex": lex}, k=fuse_k)


def md5_stub_scorer(query: str):
    """Deterministic stand-in for a cross-encoder: the score key is the
    first 8 hex chars of md5(query || '|' || doc_text) — a fixed-length
    lowercase hex STRING, which orders lexicographically exactly like its
    numeric value and is bit-identical across engines (hex→int conversion
    is not portable; see dedup._hash_slot). Pure built-in expressions, so
    the rerank plumbing is oracle-checkable end-to-end; swap in a real
    model via `rerank_topk(..., scorer=...)` (a mapInPandas
    batch-inference column factory returning a double) without touching
    the plan around it."""

    def scorer(text: Column) -> Column:
        return F.substring(F.md5(F.concat(F.lit(query), F.lit("|"), text)), 1, 8)

    return scorer


def rerank_topk(
    candidates: DataFrame,
    scorer,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """Second-stage rerank: score each first-stage candidate with a
    (potentially expensive) pairwise scorer and keep the top-k.

    The two-stage retrieve-then-rerank shape is what makes cross-encoders
    affordable: the O(corpus) work happens in stage 1 (BM25 / dense top-N,
    N ~ 100s), and the expensive per-(query, doc) scorer only ever sees the
    driver-bounded candidate set — so even a Python-batch model call is
    KB-scale. `scorer` maps a text Column to a double score Column; use
    `md5_stub_scorer` for the deterministic default or a Pandas-UDF-backed
    factory for a real model. Output: (id, ce_score, rank), ties on id.
    """
    scored = candidates.select(
        F.col(id_col).alias("id"), scorer(F.col(text_col)).alias("ce_score")
    )
    w = bounded_window(F.col("ce_score"), F.desc("ce_score"), F.asc("id"))
    return (
        scored.orderBy(F.desc("ce_score"), F.asc("id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )
