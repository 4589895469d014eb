"""IVF-PQ combined index: build/load/search/recall/compression."""

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.ivfpq import IVFPQIndex
from ocr_vector_db_spark.operators.knn import knn_brute_force


@pytest.fixture(scope="module")
def ivfpq(spark, tables, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq"))
    return IVFPQIndex.build(
        spark, tables["embeddings"], path, dim=64, num_clusters=6, m=8, k=16
    )


def test_build_layout_and_compression(ivfpq, spark):
    codes = ivfpq.codes()
    assert set(codes.columns) == {"vec_id", "cluster_id", "pq_codes"}
    assert codes.count() == 500
    # partitioned layout: cluster_id is a partition column (directory pruning)
    n_clusters = codes.select("cluster_id").distinct().count()
    assert 1 < n_clusters <= 6
    coded, raw = ivfpq.bytes_per_vector()
    assert coded == 8 and raw == 256.0  # 32x scannable-state compression


def test_load_roundtrip(ivfpq, spark):
    again = IVFPQIndex.load(spark, ivfpq.path)
    assert again.pq.codebooks == ivfpq.pq.codebooks
    assert again.centroids == ivfpq.centroids


def test_search_probes_prune_partitions(ivfpq, tables):
    emb = tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head().embedding]
    approx = ivfpq.search(qv, 5, nprobe=2)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    # pruned scan: the per-cluster filters land in PartitionFilters
    assert "PartitionFilters: [" in plan
    rows = approx.collect()
    assert len(rows) == 5
    # code-only search already lands the self-match near the top
    assert any(r.vec_id == 7 for r in rows)


def test_incremental_add_guard_compact_and_serving(spark, tables, tmp_path_factory):
    """build(evens) + add(odds) with frozen quantizers: conservation,
    re-add guard, an added vector served at similarity 1.0, and a
    compaction (generation publish) that changes nothing."""
    emb = tables["embeddings"]
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path_factory.mktemp("ivfpq_inc"))
    idx = IVFPQIndex.build(spark, evens, path, dim=64, num_clusters=4,
                           m=8, k=16)
    n0 = idx.codes().count()
    added = idx.add(odds)
    assert added == odds.count()
    assert idx.codes().count() == n0 + added
    assert idx.add(odds) == 0  # re-add guard

    # an ADDED vector is served: exact self-query → top-1 at sim 1.0
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head().embedding]
    top = idx.search(qv, 5, nprobe=4, corpus=emb, refine=8).head()
    assert top.vec_id == 7 and abs(top.similarity - 1.0) < 1e-6

    # reload from disk (Hadoop-FS meta) and compact: results unchanged
    idx2 = IVFPQIndex.load(spark, path)
    before = [r.vec_id for r in
              idx2.search(qv, 5, nprobe=4, corpus=emb, refine=8).collect()]
    assert idx2.compact() == n0 + added
    after = [r.vec_id for r in
             idx2.search(qv, 5, nprobe=4, corpus=emb, refine=8).collect()]
    assert after == before


def test_refined_search_exact_top1_and_recall(ivfpq, tables):
    emb = tables["embeddings"]
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head().embedding]
    refined = ivfpq.search(qv, 5, nprobe=2, corpus=emb).collect()
    assert refined[0].vec_id == 7
    queries = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") < 3).collect()
    ]
    rec = ivfpq.recall_at_k(emb, queries, k=10, nprobe=3, refine=8)
    assert rec >= 0.5, rec
    # probing everything degrades gracefully toward exact search
    rec_all = ivfpq.recall_at_k(emb, queries[:1], k=10, nprobe=6, refine=8)
    assert rec_all >= rec - 0.2
