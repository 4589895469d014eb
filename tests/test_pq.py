"""Product quantization: train/encode/search/recall/compression."""

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.pq import PQIndex, quantization_error


@pytest.fixture(scope="module")
def pq(spark, tables):
    return PQIndex.train(tables["embeddings"], dim=64, m=8, k=16)


def test_train_shapes(pq):
    assert len(pq.codebooks) == 8
    assert all(len(cb) == 16 for cb in pq.codebooks)
    assert all(len(c) == 8 for cb in pq.codebooks for c in cb)
    assert pq.compression_ratio() == (64 * 4) / 8  # 32x at m=8, k<=256


def test_encode_deterministic_and_bounded(pq, tables):
    enc = pq.encode(tables["embeddings"]).select("vec_id", "pq_codes")
    rows = enc.collect()
    assert all(len(r.pq_codes) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.pq_codes)
    again = {r.vec_id: r.pq_codes for r in pq.encode(tables["embeddings"]).select("vec_id", "pq_codes").collect()}
    assert all(again[r.vec_id] == r.pq_codes for r in rows)


def test_adc_search_and_recall(pq, spark, tables):
    emb = tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 11).head().embedding]
    encoded = pq.encode(emb).cache()
    # code-only search (no raw vectors): self-match should be at/near the top
    code_only = pq.search(encoded.drop("embedding").withColumn("embedding", F.lit(None)),
                          qv, 5, emb_col=None).collect()
    assert any(r.vec_id == 11 for r in code_only[:3])
    # refined search: exact re-rank puts the true match first
    refined = pq.search(encoded, qv, 5, refine=4).collect()
    assert refined[0].vec_id == 11
    # recall vs exact top-10 with refinement should be solid on 500 vectors
    queries = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    rec = pq.recall_at_k(emb, queries, kk=10, refine=8)
    assert rec >= 0.5, rec


def test_quantization_error_positive_finite(pq, tables):
    mse = quantization_error(pq, tables["embeddings"].limit(100))
    assert 0.0 < mse < 2.0  # unit vectors: worst-case sub-distance bounded


def test_encode_col_accepts_derived_expressions(pq, tables):
    """ADVICE r15: a derived / non-plain Column reference was valid before
    the generated-SQL rewrite and must stay valid — the Column fallback
    builds the identical expression tree, so codes match the named path."""
    emb = tables["embeddings"]
    named = {r.vec_id: r.c for r in emb.select(
        "vec_id", pq.encode_col("embedding").alias("c")).collect()}
    derived = {r.vec_id: r.c for r in emb.select(
        "vec_id",
        pq.encode_col(F.transform(F.col("embedding"),
                                  lambda x: x * F.lit(1.0))).alias("c"),
    ).collect()}
    assert named == derived


def test_codebook_sql_nonfinite_parses(pq, spark):
    """ADVICE r15: NaN/inf centroids (degenerate k-means cluster) must
    render as parseable SQL, like the former F.lit path did."""
    import math

    from ocr_vector_db_spark.operators.pq import PQIndex

    bad = PQIndex(dim=4, m=2, codebooks=[
        [[float("nan"), 1.0], [float("inf"), float("-inf")]],
        [[0.5, 2.0], [1.5, -1.0]],
    ])
    row = spark.sql(
        f"SELECT {bad._codebook_sql(0)} AS cb"
    ).head().cb
    assert math.isnan(row[0][0]) and row[1][0] == float("inf")
    assert row[1][1] == float("-inf")
