"""NgramLMIndex: the persisted incremental bigram LM must reproduce the
refit path (ngram_lm.bigram_cross_entropy) byte-for-byte, fold counts
exactly across add()/compact(), and read only the batch's buckets."""

from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.ngram_lm import bigram_cross_entropy
from ocr_vector_db_spark.operators.ngram_lm_index import NgramLMIndex


def _scores(df):
    return {(r[0], r[1], r[2]) for r in df.collect()}


def test_lm_index_matches_refit(spark, tables, tmp_path_factory):
    """build() then score_batch(corpus) ≡ the per-call refit scoring —
    same rows, bit-identical doubles."""
    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("lm"))
    idx = NgramLMIndex.build(spark, docs, path, n_buckets=16)
    assert _scores(idx.score_batch(docs)) == _scores(bigram_cross_entropy(docs))


def test_lm_index_incremental_equals_full_build(spark, tables, tmp_path_factory):
    """build(A)+add(B) ≡ build(A∪B): stats fold as exact integers (vocab
    delta via the pruned anti-join) and scores are bit-identical."""
    docs = tables["documents"]
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)

    p_inc = str(tmp_path_factory.mktemp("lm_inc"))
    inc = NgramLMIndex.build(spark, a, p_inc, n_buckets=8)
    assert inc.add(b) == b.count()

    p_full = str(tmp_path_factory.mktemp("lm_full"))
    full = NgramLMIndex.build(spark, docs, p_full, n_buckets=8)

    si, sf_ = inc.stats().head(), full.stats().head()
    assert (si["vocab"], si["n_tokens"], si["n_bigrams"], si["n_docs"]) == (
        sf_["vocab"], sf_["n_tokens"], sf_["n_bigrams"], sf_["n_docs"])
    assert _scores(inc.score_batch(docs)) == _scores(full.score_batch(docs))
    # index-served PMI == refit PMI, exactly, through the incremental build
    from ocr_vector_db_spark.operators.ngram_lm import pmi_collocations

    got = [tuple(r) for r in inc.pmi_topk(min_count=3, top_k=20).collect()]
    want = [tuple(r)
            for r in pmi_collocations(docs, min_count=3, top_k=20).collect()]
    assert got == want


def test_lm_index_compact_folds_without_changing_scores(spark, tables,
                                                        tmp_path_factory):
    """compact() folds the appended count rows (one row per key afterward)
    and must not change a single score — reads already fold."""
    docs = tables["documents"]
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path_factory.mktemp("lm_cpt"))
    idx = NgramLMIndex.build(spark, a, path, n_buckets=8)
    idx.add(b)
    before = _scores(idx.score_batch(docs))
    n_keys = idx.pairs().select("tok_a", "tok_b").distinct().count()
    assert idx.pairs().count() > n_keys  # appends left per-batch rows
    assert idx.compact() == n_keys
    assert idx.pairs().count() == n_keys  # folded: one row per pair
    assert _scores(idx.score_batch(docs)) == before


def test_lm_index_readd_guard(spark, tables, tmp_path_factory):
    """Re-submitting indexed docs is a no-op (no double counts); a mixed
    batch adds only the new rows."""
    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("lm_guard"))
    idx = NgramLMIndex.build(spark, docs, path, n_buckets=8)
    s0 = idx.stats().head()
    assert idx.add(docs) == 0
    s1 = idx.stats().head()
    assert (s1["vocab"], s1["n_tokens"], s1["n_docs"]) == (
        s0["vocab"], s0["n_tokens"], s0["n_docs"])

    mixed = docs.limit(3).unionByName(
        spark.createDataFrame(
            [(10**9 + 7, "zzzunseen token text about distributed data")],
            "doc_id bigint, text string",
        ),
        allowMissingColumns=True,
    )
    assert idx.add(mixed) == 1
    s2 = idx.stats().head()
    assert s2["n_docs"] == s0["n_docs"] + 1
    assert s2["vocab"] > s0["vocab"]  # 'zzzunseen' is genuinely new


def test_lm_index_scores_unseen_batch(spark, tables, tmp_path_factory):
    """A batch NOT in the corpus scores with c(ab)=0 / c(a)=0 smoothing —
    every unseen bigram costs exactly -ln(1/V)."""
    import math

    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("lm_new"))
    idx = NgramLMIndex.build(spark, docs, path, n_buckets=8)
    v = float(idx.stats().head()["vocab"])
    batch = spark.createDataFrame(
        [(1, "qqxa qqxb qqxc")], "doc_id bigint, text string"
    )
    row = idx.score_batch(batch).head()
    assert row["n_bigrams"] == 2
    assert row["avg_neg_logprob"] == round(-math.log(1.0 / v), 6)


def test_lm_index_score_plan_is_partition_pruned(spark, tables,
                                                 tmp_path_factory):
    """The pair-table scan behind score_batch reads only the batch's own
    buckets (PartitionFilters on `bucket`), never the full table."""
    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("lm_plan"))
    idx = NgramLMIndex.build(spark, docs, path, n_buckets=16)
    plan = (
        idx.score_batch(docs.limit(5))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both count-table scans carry a bucket INSET partition filter (the
    # documents scan also prints PartitionFilters, empty — match the
    # pruned form specifically)
    assert "PartitionFilters: [bucket#" in plan
    assert "PartitionFilters: [ubucket#" in plan
