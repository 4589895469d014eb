"""NearDupPairIndex: the persisted closure-family pair store must serve
byte-identically to the scan-path formulations it replaces (q109/q110/
q113/q145), across build/add/compact and crash-retry duplication."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_vector_db_spark.operators import dedup
from ocr_vector_db_spark.operators.neardup_pair_index import NearDupPairIndex


def _rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def built(spark, tables, tmp_path_factory):
    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("ndp_full"))
    idx = NearDupPairIndex.build(spark, docs, path, num_hashes=16, bands=4,
                                 n=2, n_buckets=8)
    return docs, idx


def test_load_roundtrip(spark, built):
    _, idx = built
    idx2 = NearDupPairIndex.load(spark, idx.path)
    assert (idx2.num_hashes, idx2.bands, idx2.n, idx2.n_buckets) == (16, 4, 2, 8)


@pytest.mark.parametrize("cc", ["label", "star"])
def test_components_match_scan_formulation(built, cc):
    """components() ≡ minhash_neardup_components row-for-row, both
    closure engines — the q109/q110 serving contract."""
    docs, idx = built
    want = _rows(dedup.minhash_neardup_components(
        docs, num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id",
        threshold=0.5, collapse_identical=True, cc=cc,
    ))
    got = _rows(idx.components(threshold=0.5, cc=cc))
    assert got == want


def test_candidate_pairs_match_lsh_candidates(built):
    """candidate_pairs() ≡ minhash_lsh_candidates (uncollapsed expansion,
    est_jaccard included) — the q113 serving contract."""
    docs, idx = built
    want = _rows(dedup.minhash_lsh_candidates(docs, 16, 4, 2))
    got = _rows(idx.candidate_pairs())
    assert got == want


def test_incremental_add_equals_full_build(spark, tables, tmp_path_factory):
    """build(A) + add(B) + compact must serve identically to build(A∪B) —
    the streaming-consistency property every persisted index here pins."""
    docs = tables["documents"]
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    odds = docs.filter(F.col("doc_id") % 2 == 1)

    path = str(tmp_path_factory.mktemp("ndp_inc"))
    idx = NearDupPairIndex.build(spark, evens, path, num_hashes=16, bands=4,
                                 n=2, n_buckets=8)
    assert idx.add(evens) == 0  # re-add guard
    n_members_before = idx.members().count()
    added = idx.add(odds)
    assert added == odds.count()
    assert idx.members().count() == n_members_before + added
    assert idx.compact() == docs.count()

    full_path = str(tmp_path_factory.mktemp("ndp_ref"))
    full = NearDupPairIndex.build(spark, docs, full_path, num_hashes=16,
                                  bands=4, n=2, n_buckets=8)

    assert _rows(idx.members()) == _rows(full.members())
    assert _rows(idx.groups()) == _rows(full.groups())
    assert _rows(idx.pairs().dropDuplicates(["key_a", "key_b"])) == \
        _rows(full.pairs())
    for cc in ("label", "star"):
        assert _rows(idx.components(0.5, cc)) == _rows(full.components(0.5, cc))
    assert _rows(idx.candidate_pairs()) == _rows(full.candidate_pairs())


def test_crash_retry_duplicates_are_absorbed(spark, tables, tmp_path_factory):
    """A crash between add()'s appends makes the retry re-append pair/band/
    sig rows (members — the guard key — lands last). Readers must dedup:
    simulate the worst window by double-appending the pair table."""
    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("ndp_dup"))
    idx = NearDupPairIndex.build(spark, docs, path, num_hashes=16, bands=4,
                                 n=2, n_buckets=8)
    clean_pairs = _rows(idx.candidate_pairs())
    clean_comp = _rows(idx.components(0.5, "star"))

    n0 = idx.pairs().count()
    rows = idx.pairs().collect()  # materialize off-path: appending a
    # self-read plan is exactly the hazard add() avoids by caching first
    spark.createDataFrame(rows, idx.pairs().schema).write.mode(
        "append").parquet(idx._table_dir("pairs"))
    assert idx.pairs().count() == 2 * n0

    assert _rows(idx.candidate_pairs()) == clean_pairs
    assert _rows(idx.components(0.5, "star")) == clean_comp


def test_empty_batch_add_is_noop(spark, tables, tmp_path_factory):
    docs = tables["documents"]
    path = str(tmp_path_factory.mktemp("ndp_empty"))
    idx = NearDupPairIndex.build(spark, docs.limit(10), path, num_hashes=16,
                                 bands=4, n=2, n_buckets=4)
    empty = docs.filter(F.lit(False))
    assert idx.add(empty) == 0
    assert idx.members().count() == 10
