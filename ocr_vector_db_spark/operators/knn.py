"""K-nearest-neighbor search over an embedding column.

The reference serves `ORDER BY embedding <=> q LIMIT k` through a pgvector
HNSW index (retrieval/search.py:111-113, storage/schema.py:80-85). Spark has
no online ANN index; the scale-aware equivalents here are:

- `knn_brute_force`: scan + score + TakeOrderedAndProject. Exact. On a
  columnar parquet scan with codegen this is embarrassingly parallel and the
  right answer up to ~10^7 vectors per executor-group; Catalyst turns the
  orderBy+limit into a per-partition top-k + tree reduction (no global sort).
- `build_ivf_index` / `knn_ivf`: KMeans centroids → embeddings partitioned by
  cluster_id → query prunes to the `nprobe` nearest clusters (the DataFrame
  analogue of `ivfflat.probes`, storage/schema.py:38-41). At 100 TB the
  centroid table is tiny (broadcast) and cluster pruning cuts the scan by
  num_clusters/nprobe; writing the index partitioned by cluster_id makes the
  pruning a partition-pruned scan, not a filter.
- `knn_batch`: many-query batch mode as a blocked broadcast join (queries
  are broadcast; one slim scan of the corpus scores all queries) with a
  TWO-PHASE top-k: the rank-limit pushes a PARTIAL WindowGroupLimit ahead
  of the exchange (map-side per-partition top-k per query), so the shuffle
  carries ≤ partitions×Q×k slim rows — never |corpus|×|Q| — and the
  winners broadcast-join back for the output columns.

Scoring is pure built-in expressions (functions/vector.py) — no Python in
the hot path. Ties broken by `id_col` so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.vector import cosine_similarity_col, dot_col

SIM_PRECISION = 6  # round similarities so rankings are reproducible across engines


def with_similarity(
    df: DataFrame,
    query_vector: list[float],
    emb_col: str = "embedding",
    out_col: str = "similarity",
    pre_normalized: bool = False,
) -> DataFrame:
    import math

    q = F.array(*[F.lit(float(v)) for v in query_vector])
    emb = F.col(emb_col)
    if pre_normalized:
        sim = dot_col(emb, q)
    else:
        # Hoist the query norm to the driver: Catalyst doesn't constant-fold
        # aggregate() over a literal array, so leaving it in the expression
        # recomputes the query norm per row.
        q_norm = math.sqrt(sum(float(v) * float(v) for v in query_vector))
        from ocr_vector_db_spark.functions.vector import norm_col

        denom = norm_col(emb) * F.lit(q_norm)
        sim = F.when(denom != 0.0, dot_col(emb, q) / denom)
    return df.withColumn(out_col, F.round(sim, SIM_PRECISION))


def knn_brute_force(
    df: DataFrame,
    query_vector: list[float],
    k: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    pre_normalized: bool = False,
) -> DataFrame:
    """Exact top-k by cosine similarity. orderBy+limit compiles to
    TakeOrderedAndProject: per-partition heap + driver merge, no full sort."""
    scored = with_similarity(df, query_vector, emb_col, "similarity", pre_normalized)
    return scored.orderBy(F.desc("similarity"), F.col(id_col)).limit(k)


def knn_per_group(
    df: DataFrame,
    query_vector: list[float],
    k: int,
    group_col: str,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k nearest per group (e.g. per label / per collection)."""
    scored = with_similarity(df, query_vector, emb_col)
    w = Window.partitionBy(group_col).orderBy(F.desc("similarity"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ----------------------------------------------------------------- IVF index


def build_ivf_index(
    df: DataFrame,
    num_clusters: int,
    emb_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
):
    """KMeans over the embedding column → (assigned DataFrame, centroids).

    Returns (df + cluster_id column, list[(cluster_id, centroid)]). At scale,
    persist the assigned table partitioned by cluster_id so query-time nprobe
    pruning becomes partition pruning.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    ml_df = df.withColumn("__features", array_to_vector(F.col(emb_col).cast("array<double>")))
    km = KMeans(k=num_clusters, seed=seed, maxIter=max_iter, featuresCol="__features", predictionCol="cluster_id")
    model = km.fit(ml_df)
    assigned = model.transform(ml_df).drop("__features")
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return assigned, centroids


def knn_ivf(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vector: list[float],
    k: int,
    nprobe: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score centroids driver-side (they're tiny), prune to
    the nprobe nearest clusters, exact search inside them. `cluster_id IN (…)`
    is partition-prunable when the index table is written partitioned by it."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ranked = sorted(centroids, key=lambda c: (-cos(c[1], query_vector), c[0]))
    probe_ids = [cid for cid, _ in ranked[:nprobe]]
    pruned = indexed.filter(F.col("cluster_id").isin(probe_ids))
    return knn_brute_force(pruned, query_vector, k, emb_col, id_col)


# --------------------------------------------------------------- batch mode


def knn_batch(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_emb: str = "embedding",
    query_emb: str = "embedding",
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    block_col: str | None = None,
    pre_reduce: bool = True,
    ids_only: bool = False,
) -> DataFrame:
    """Top-k corpus rows per query row (`corpus_id` must be unique).

    Queries are broadcast (small side) so the corpus is scanned once for
    scoring; `block_col` (e.g. an IVF cluster id present on both sides)
    prunes the cross product to matching blocks and is the right call at
    full 100 TB scale.

    Two-phase top-k (the default): scoring happens on a SLIM
    (query_id, corpus_id, similarity) projection — column pruning keeps the
    scoring scan to id+embedding(+block), and the map-side sort orders
    3-column rows, never full corpus rows. The rank-≤-k filter over the
    per-query window compiles to WindowGroupLimit with a PARTIAL stage
    (SPARK-37099, Spark ≥3.5): each input partition emits only its own
    top-k per query BEFORE the exchange, so the shuffle carries
    ≤ partitions × Q × k slim rows instead of |corpus| × |Q| — verified by
    the plan-shape regression test. The Q×k winners then broadcast-join
    back to the corpus to restore the full output columns.

    With `pre_reduce=False` the rank runs over the full-width scored stream
    (corpus columns ride through the sort/exchange) — the parity baseline
    for tests and the shape this operator had before the slim rewrite.

    `ids_only=True` returns the slim winners (query_id, corpus_id,
    similarity, rank) WITHOUT the restore join — for consumers like recall
    measurement that only compare id sets, skipping the second corpus
    scan. Implies the pre-reduce plan."""
    # The restore join re-attaches (query_id, similarity, rank) onto the
    # corpus columns — a corpus already carrying any of those names would
    # make the select ambiguous and silently mislabel output, so fail fast.
    reserved = {query_id, "similarity", "rank"}
    clash = reserved & set(corpus.columns)
    if clash:
        raise ValueError(
            f"knn_batch: corpus columns {sorted(clash)} collide with the "
            f"output columns ({sorted(reserved)}); rename them first"
        )
    q = queries.select(
        F.col(query_id), F.col(query_emb).alias("__q_emb"),
        *([F.col(block_col).alias("__q_block")] if block_col else []),
    )
    if block_col:
        joined = corpus.join(F.broadcast(q), F.col(block_col) == F.col("__q_block"))
    else:
        joined = corpus.crossJoin(F.broadcast(q))
    # generated SQL, one parse: the Column form's five higher-order
    # functions cost ~0.2 s of Py4J lambda machinery per construction,
    # re-paid by every serving/recall-gate plan (optimization r16); the
    # parsed tree and float-op order are identical
    from ocr_vector_db_spark.functions.vector import cosine_similarity_sql

    sim = F.round(
        F.expr(cosine_similarity_sql(corpus_emb, "__q_emb")), SIM_PRECISION
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("similarity"), F.col(corpus_id))
    if not pre_reduce and not ids_only:
        scored = joined.withColumn("similarity", sim).drop("__q_emb", "__q_block")
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )
    winners = (
        joined.select(F.col(query_id), F.col(corpus_id), sim.alias("similarity"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    if ids_only:
        return winners
    out_cols = [c for c in corpus.columns] + [query_id, "similarity", "rank"]
    return corpus.join(F.broadcast(winners), corpus_id).select(*out_cols)
