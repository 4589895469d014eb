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


def test_search_batch_matches_per_query_search(ivfpq, spark, tables):
    """The batched serving path (executor-side probe ranking + ADC tables)
    must reproduce the single-query path bit-for-bit: same probe sets,
    same pq_distances, same refined similarities, same ids — for every
    query and at more than one nprobe."""
    emb = tables["embeddings"]
    qids = [0, 7, 23, 42, 311]
    qrows = {r.vec_id: [float(x) for x in r.embedding]
             for r in emb.filter(F.col("vec_id").isin(qids)).collect()}
    qdf = spark.createDataFrame(
        [(i, qrows[i]) for i in qids],
        "query_id bigint, embedding array<double>",
    )
    for nprobe in (2, 6):
        # code-only (no refine): compare (id, pq_distance) per query
        batch = {
            (r.query_id, r.rank): (r.vec_id, r.pq_distance)
            for r in ivfpq.search_batch(qdf, 5, nprobe=nprobe).collect()
        }
        for qid in qids:
            single = ivfpq.search(qrows[qid], 5, nprobe=nprobe).collect()
            for rk, r in enumerate(single, start=1):
                assert batch[(qid, rk)] == (r.vec_id, r.pq_distance), (
                    nprobe, qid, rk)

    # refined: compare (id, similarity) per query
    batch = {
        (r.query_id, r.rank): (r.vec_id, r.similarity)
        for r in ivfpq.search_batch(
            qdf, 5, nprobe=3, corpus=emb, refine=4
        ).collect()
    }
    for qid in qids:
        single = ivfpq.search(
            qrows[qid], 5, nprobe=3, corpus=emb, refine=4
        ).collect()
        for rk, r in enumerate(single, start=1):
            assert batch[(qid, rk)] == (r.vec_id, r.similarity), (qid, rk)
    # every query drawn from the corpus must find itself first
    for qid in qids:
        assert batch[(qid, 1)] == (qid, 1.0)


def test_search_batch_is_one_plan_no_driver_loop(ivfpq, spark, tables):
    """Plan shape: one codes scan + broadcast joins; no per-query unions,
    no CartesianProduct beyond the bounded centroid/1-row broadcasts."""
    emb = tables["embeddings"]
    qdf = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        ivfpq.search_batch(qdf, 5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("Union") == 0  # one scan, not per-query branches


def test_hierarchical_ivfpq_matches_flat(spark, tables, tmp_path_factory):
    """IVF-PQ with the two-level coarse layer (IVFIndex parity): load
    round-trips the L1, probe ranking / incremental residual assignment /
    single-query search / batched serving at branches == |L1| all
    reproduce the flat index bit-for-bit, and the hier assignment plan
    reads the L2 parquet table instead of broadcasting every centroid."""
    path = str(tmp_path_factory.mktemp("ivfpq_h"))
    emb = tables["embeddings"]
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    idx = IVFPQIndex.build(
        spark, evens, path, dim=64, num_clusters=6, m=8, k=16,
        l1_branches=3,
    )
    assert len(idx.l1) == 3 and len(idx.l2_to_l1) == 6

    again = IVFPQIndex.load(spark, path)
    assert again.l1 == idx.l1 and again.l2_to_l1 == idx.l2_to_l1

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 8).head().embedding]
    for np_ in (1, 3, 6):
        assert idx.probe_clusters(qv, np_, branches=3) == \
            idx.probe_clusters(qv, np_)

    # incremental add routed through the hier L2 join == flat assignment
    odds = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 100))
    flat_codes = {
        (r.vec_id, r.cluster_id, tuple(r.pq_codes))
        for r in idx._residual_codes(odds, "embedding", "vec_id").collect()
    }
    hier_plan_df = idx._residual_codes(odds, "embedding", "vec_id", branches=3)
    hier_codes = {
        (r.vec_id, r.cluster_id, tuple(r.pq_codes))
        for r in hier_plan_df.collect()
    }
    assert hier_codes == flat_codes and len(flat_codes) == 50
    plan = hier_plan_df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<cluster_id:int,centroid:array<double>>" in plan

    n = idx.add(odds, assume_new=True, branches=3)
    assert n == 50
    flat_rows = idx.search(qv, 5, nprobe=6).collect()
    hier_rows = idx.search(qv, 5, nprobe=6, branches=3).collect()
    assert [tuple(r) for r in hier_rows] == [tuple(r) for r in flat_rows]

    qdf = emb.filter(F.col("vec_id").isin([8, 9, 42])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    flat_b = idx.search_batch(qdf, 5, nprobe=6).collect()
    hier_b = idx.search_batch(qdf, 5, nprobe=6, branches=3).collect()
    assert sorted(tuple(r) for r in hier_b) == \
        sorted(tuple(r) for r in flat_b)


def test_standardized_ivfpq_symmetric(spark, tables, tmp_path_factory):
    """build(standardize=True): both quantization levels live in the
    whitened space and every public entry transforms symmetrically — a
    corpus member queried RAW refines to itself at exactly 1.0, adds
    land in index space, batch serving matches per-query serving, and a
    flag-off index persists no profile."""
    e = tables["embeddings"]
    path = str(tmp_path_factory.mktemp("ivfpq_std"))
    IVFPQIndex.build(
        spark, e, path, dim=64, num_clusters=6, m=8, k=16, standardize=True
    )
    idx = IVFPQIndex.load(spark, path)  # profile survives the meta round-trip
    assert len(idx.std_stats) == 64

    qv = [float(x) for x in
          e.filter(F.col("vec_id") == 7).head().embedding]
    top = idx.search(qv, 1, nprobe=6, corpus=e, refine=4).head()
    assert top.vec_id == 7 and top.similarity == 1.0

    # batch serving ≡ per-query serving under the same profile
    queries = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {(r.query_id, r.vec_id, r.pq_distance)
           for r in idx.search_batch(queries, 3, nprobe=6).collect()}
    want = set()
    for r in queries.collect():
        for s in idx.search([float(x) for x in r.embedding], 3,
                            nprobe=6).collect():
            want.add((r.query_id, s.vec_id, s.pq_distance))
    assert got == want

    # a raw held-out vector added through the frozen quantizers serves
    # back at 1.0 (refined) — add() transformed it into index space
    import numpy as np

    rng = np.random.default_rng(3)
    held = [float(x) for x in rng.normal(size=64)]
    hdf = spark.createDataFrame([(9001, held)],
                                "vec_id bigint, embedding array<double>")
    assert idx.add(hdf) == 1
    corpus2 = e.unionByName(hdf, allowMissingColumns=True)
    top = idx.search(held, 1, nprobe=6, corpus=corpus2, refine=4).head()
    assert top.vec_id == 9001 and top.similarity == 1.0

    # recall against the whitened exact baseline (PQ is lossy — parity
    # with the flag-off test's bound, not exactness)
    rec = idx.recall_at_k(e, [qv], k=5, nprobe=6, refine=8)
    assert rec >= 0.6, rec

    # flag-off: no profile in meta
    p2 = str(tmp_path_factory.mktemp("ivfpq_raw"))
    IVFPQIndex.build(spark, e, p2, dim=64, num_clusters=6, m=8, k=16)
    assert IVFPQIndex.load(spark, p2).std_stats == []
