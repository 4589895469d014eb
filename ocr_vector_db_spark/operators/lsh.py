"""MLlib random-projection LSH for many-query similarity joins at scale.

SURVEY §2.3/§4: the one genuine similarity JOIN in the system. Brute force
(knn_batch) scans corpus×queries; `BucketedRandomProjectionLSH` prunes to
hash-bucket collisions, the standard scale path when both sides are large.

Cosine ↔ Euclidean bridge: on unit-normalized vectors,
    ||a-b||² = 2 - 2·cos(a,b)
so a cosine threshold t becomes a euclidean threshold sqrt(2-2t) and the
ranking is preserved. We L2-normalize both sides, run the euclidean LSH, and
convert distances back to cosine on the way out.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.vector import l2_normalize_col


def _to_vec(df: DataFrame, emb_col: str, out: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        out, array_to_vector(l2_normalize_col(F.col(emb_col)).cast("array<double>"))
    )


def cosine_to_euclidean(threshold: float) -> float:
    return math.sqrt(max(0.0, 2.0 - 2.0 * threshold))


def lsh_similarity_join(
    left: DataFrame,
    right: DataFrame,
    cosine_threshold: float = 0.8,
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    emb_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """All (left, right) pairs with cosine ≥ threshold, via LSH bucket
    pruning. Returns (left_id, right_id, cosine)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    lv = _to_vec(left, emb_col, "__features")
    rv = _to_vec(right, emb_col, "__features")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__features", outputCol="__hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(lv)
    dist = cosine_to_euclidean(cosine_threshold)
    joined = model.approxSimilarityJoin(lv, rv, dist, distCol="__dist")
    return joined.select(
        F.col(f"datasetA.{left_id}").alias(left_id),
        F.col(f"datasetB.{right_id}").alias(right_id),
        F.round(1.0 - F.col("__dist") * F.col("__dist") / 2.0, 6).alias("cosine"),
    )


def lsh_near_dup_pairs(
    df: DataFrame,
    cosine_threshold: float = 0.9,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    **kwargs,
) -> DataFrame:
    """Self-join near-dup variant: unordered pairs (a < b)."""
    other = df.select(F.col(id_col).alias("__rid"), F.col(emb_col))
    pairs = lsh_similarity_join(
        df, other, cosine_threshold, emb_col=emb_col,
        left_id=id_col, right_id="__rid", **kwargs,
    )
    return (
        pairs.filter(F.col(id_col) < F.col("__rid"))
        .select(F.col(id_col).alias("id_a"), F.col("__rid").alias("id_b"), "cosine")
    )


def lsh_nearest_neighbors(
    df: DataFrame,
    query_vector: list[float],
    k: int,
    emb_col: str = "embedding",
    bucket_length: float = 0.5,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Single-query ANN via the fitted LSH model (approxNearestNeighbors)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    norm = math.sqrt(sum(x * x for x in query_vector)) or 1.0
    key = Vectors.dense([x / norm for x in query_vector])
    dv = _to_vec(df, emb_col, "__features")
    model = BucketedRandomProjectionLSH(
        inputCol="__features", outputCol="__hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    ).fit(dv)
    out = model.approxNearestNeighbors(dv, key, k, distCol="__dist")
    return out.withColumn(
        "cosine", F.round(1.0 - F.col("__dist") * F.col("__dist") / 2.0, 6)
    ).drop("__features", "__hashes")
