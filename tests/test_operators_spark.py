"""Spark-side tests: column functions agree with their pure-Python twins and
operators behave on the driver-generated testdata."""

import math

import pytest
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions import hashing, text_analysis, validators, vector
from ocr_vector_db_spark.operators import dedup, grouping, knn, metrics

SAMPLES = [
    "short",
    "Copyright © 2023 Someone",
    "   42   ",
    "See Figure 3",
    "그림 3 참조",
    "코드 1-1 decorator example heading",
    "A genuinely informative sentence about Spark.",
    "same line\nsame line\nsame line",
    "the quick brown fox jumps over the lazy dog",
    "der hund ist nicht da und das ist gut",
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], ["id", "content"])


def test_validator_col_matches_python(sample_df):
    rows = sample_df.withColumn(
        "eligible", validators.is_eligible_col(F.col("content"))
    ).collect()
    for r in rows:
        assert r.eligible == validators.is_eligible(r.content), r.content


def test_hashing_cols_match_python(sample_df):
    df = sample_df.select(
        "content",
        hashing.content_hash_col(F.lit("pid"), F.lit("text"), F.lit(None), F.col("content")).alias("h"),
        hashing.doc_id_col(F.lit("pid"), F.lit("text"), F.lit(None), F.col("content")).alias("d"),
    )
    for r in df.collect():
        assert r.h == hashing.content_hash("pid", "text", None, r.content)
        assert r.d == hashing.compute_doc_id("pid", "text", None, r.content)


def test_text_analysis_cols_match_python(sample_df):
    df = sample_df.select(
        "content",
        text_analysis.token_count_col(F.col("content")).alias("ntok"),
        text_analysis.detect_language_col(F.col("content")).alias("lang"),
        text_analysis.quality_score_col(F.col("content")).alias("q"),
    )
    for r in df.collect():
        assert r.ntok == text_analysis.token_count(r.content), r.content
        assert r.lang == text_analysis.detect_language(r.content), r.content
        assert abs(r.q - text_analysis.quality_score(r.content)) < 1e-6, r.content


def test_cosine_col_matches_python(spark):
    a, b = vector.embed_text("aaa", 8), vector.embed_text("bbb", 8)
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(vector.cosine_similarity_col(F.col("a"), F.col("b")).alias("c")).head().c
    dot = sum(x * y for x, y in zip(a, b))
    na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
    assert abs(got - dot / (na * nb)) < 1e-12


def test_knn_brute_force(tables):
    emb = tables["embeddings"]
    qv = [r for r in emb.filter(F.col("vec_id") == 0).head().embedding]
    top = knn.knn_brute_force(emb, qv, 10).collect()
    assert len(top) == 10
    assert top[0].vec_id == 0 and abs(top[0].similarity - 1.0) < 1e-6
    sims = [r.similarity for r in top]
    assert sims == sorted(sims, reverse=True)


def test_knn_ivf_matches_brute_force_on_full_probe(tables):
    emb = tables["embeddings"]
    qv = [r for r in emb.filter(F.col("vec_id") == 1).head().embedding]
    indexed, centroids = knn.build_ivf_index(emb, num_clusters=4)
    exact = {r.vec_id for r in knn.knn_brute_force(emb, qv, 5).collect()}
    # probing every cluster must reproduce the exact result
    full = {r.vec_id for r in knn.knn_ivf(indexed, centroids, qv, 5, nprobe=4).collect()}
    assert full == exact
    # pruned probe returns k rows from the probed clusters
    approx = knn.knn_ivf(indexed, centroids, qv, 5, nprobe=2).collect()
    assert len(approx) == 5


def test_knn_batch_two_phase_matches_naive(tables):
    """The two-phase top-k (slim projection + partial WindowGroupLimit +
    broadcast rejoin) must reproduce the full-width single-window plan
    row-for-row, including rounded-sim tie-breaks on vec_id."""
    emb = tables["embeddings"]
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cols = ["query_id", "vec_id", "similarity", "rank"]
    fast = knn.knn_batch(emb, queries, 5).select(*cols)
    naive = knn.knn_batch(emb, queries, 5, pre_reduce=False).select(*cols)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_knn_batch_two_phase_with_ties_and_duplicate_sims(spark):
    """Seeded corpus engineered so many vectors score IDENTICALLY (after
    6-dp rounding) and the tie boundary falls inside a partition's local
    top-k — the map-side partial rank must still match the naive rank."""
    import random

    rnd = random.Random(7)
    base = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.6, 0.8, 0.0]]
    rows = []
    for i in range(60):
        v = base[i % 3]
        # half the corpus are exact copies (tie groups); half are jittered
        if i % 2 == 0:
            rows.append((i, [float(x) for x in v]))
        else:
            rows.append(
                (i, [float(x) + rnd.uniform(-0.05, 0.05) for x in v])
            )
    rows.append((999, [0.0, 0.0, 0.0]))  # zero vector → null similarity
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).repartition(8)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0]), (2, [0.5, 0.5, 0.5])],
        "query_id bigint, embedding array<double>",
    )
    cols = ["query_id", "vec_id", "similarity", "rank"]
    fast = knn.knn_batch(corpus, queries, 7).select(*cols)
    naive = knn.knn_batch(corpus, queries, 7, pre_reduce=False).select(*cols)
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want and len(got) == 21


def test_knn_batch_rejects_reserved_column_collisions(spark):
    """A corpus already carrying `similarity`, `rank`, or the query-id
    name would make the restore join's select ambiguous and silently
    mislabel output — knn_batch must fail fast instead."""
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id bigint, embedding array<double>"
    )
    for bad in ("similarity", "rank", "query_id"):
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0], 9.9)],
            f"vec_id bigint, embedding array<double>, {bad} double",
        )
        with pytest.raises(ValueError, match=bad):
            knn.knn_batch(corpus, queries, 3)


def test_knn_batch_blocked_two_phase(spark):
    """block_col pruning composes with the two-phase reduce: candidates are
    restricted to matching blocks on both paths."""
    rows = [(i, [float(i % 5), 1.0], i % 3) for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, blk int"
    ).repartition(4)
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0], 0), (1, [4.0, 1.0], 1)],
        "query_id bigint, embedding array<double>, blk int",
    )
    cols = ["query_id", "vec_id", "similarity", "rank"]
    fast = knn.knn_batch(corpus, queries, 4, block_col="blk").select(*cols)
    naive = knn.knn_batch(
        corpus, queries, 4, block_col="blk", pre_reduce=False
    ).select(*cols)
    got = sorted(map(tuple, fast.collect()))
    assert got == sorted(map(tuple, naive.collect())) and len(got) == 8
    # every candidate came from the query's own block
    blk = {r.vec_id % 3 for r in fast.filter(F.col("query_id") == 0).collect()}
    assert blk == {0}


def test_dedup_exact_and_jaccard(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, "The  quick   Brown fox"),   # exact dup after normalization
        (3, "the quick brown foxes run"),
        (4, "completely different words here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    groups = dedup.exact_duplicates(df).collect()
    assert len(groups) == 1 and groups[0].n_dups == 2 and groups[0].keep_id == 1
    kept = {r.doc_id for r in dedup.dedup_exact(df).collect()}
    assert kept == {1, 3, 4}
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.3, n=1).collect()
    assert any({p.doc_a, p.doc_b} == {1, 2} for p in pairs)


def test_minhash_lsh_finds_near_dups(spark):
    base = "spark is a unified analytics engine for large scale data processing " * 3
    rows = [
        (1, base),
        (2, base + " extra token"),
        (3, "unrelated content entirely different domain words " * 4),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cands = dedup.minhash_lsh_candidates(df, num_hashes=16, bands=4).collect()
    assert any({c.doc_a, c.doc_b} == {1, 2} and c.est_jaccard > 0.5 for c in cands)
    assert not any({c.doc_a, c.doc_b} == {1, 3} for c in cands)


def test_minhash_components_collapsed_matches_uncollapsed(spark, tables):
    """The hot-group-safe collapsed path must be row-for-row identical to
    the plain candidates→closure path — on the sf corpus AND on a synthetic
    hot corpus (one text duplicated 200×), where it must also shrink the
    band self-join to the distinct-signature level (0 representative pairs
    instead of 200·199/2 within the identical group)."""
    kw = dict(num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id")

    d = tables["documents"].limit(400)
    a = {tuple(r) for r in dedup.minhash_neardup_components(
        d, collapse_identical=True, **kw).collect()}
    b = {tuple(r) for r in dedup.minhash_neardup_components(
        d, collapse_identical=False, **kw).collect()}
    assert a == b and len(a) > 0

    hot = "identical boilerplate page repeated across the corpus " * 4
    rows = [(i, hot) for i in range(1, 201)] + [
        (201, hot + " tail variation token"),
        (202, "completely different content words nothing shared here " * 4),
    ]
    hd = spark.createDataFrame(rows, ["doc_id", "text"])
    ca = {tuple(r) for r in dedup.minhash_neardup_components(
        hd, collapse_identical=True, **kw).collect()}
    cb = {tuple(r) for r in dedup.minhash_neardup_components(
        hd, collapse_identical=False, **kw).collect()}
    assert ca == cb
    # every member of the identical group lands in component 1
    assert all(any(r == (i, 1, i == 1) for r in ca) for i in range(1, 201))

    # pair volume: representatives only — the 200-member group contributes
    # ONE row to the band join, so candidate pairs among representatives
    # can't exceed the distinct-signature pair count (3 sigs → ≤ 3 pairs),
    # vs 19900+ intra-group pairs on the uncollapsed path
    sig = dedup.minhash_signatures(hd, 16, 2, "text", "doc_id")
    mh = [f"mh_{i}" for i in range(16)]
    reps = sig.groupBy(*mh).agg(F.min("doc").alias("doc")).select("doc", *mh)
    assert dedup.candidates_from_signatures(reps, 16, 4).count() <= 3
    assert dedup.candidates_from_signatures(sig, 16, 4).count() >= 19900

    # the keep-min drop set (streaming gate's intra-batch rule) must also
    # match its uncollapsed formulation on both corpora
    for frame in (d, hd):
        collapsed = {r[0] for r in dedup.minhash_dropped_ids(
            frame, 16, 4, 2, "text", "doc_id", 0.5).collect()}
        plain = {r[0] for r in dedup.minhash_lsh_candidates(frame, 16, 4, 2)
                 .filter(F.col("est_jaccard") >= 0.5)
                 .select("doc_b").distinct().collect()}
        assert collapsed == plain
    assert 1 not in collapsed and {2, 200} <= collapsed  # hot corpus


def test_connected_components_star_matches_and_beats_label(spark, tables):
    """Star contraction must produce the same components as min-label on a
    shallow graph (the minhash pair graph), and must fully merge a
    200-link chain — diameter 200 — that min-label's default 30-round
    budget provably cannot (its label only travels one hop per round)."""
    d = tables["documents"].limit(400)
    pairs = dedup.minhash_lsh_candidates(d, 16, 4, 2).filter(
        F.col("est_jaccard") >= 0.5
    ).cache()
    a = {(r.id, r.comp) for r in dedup.connected_components(pairs).collect()}
    b = {(r.id, r.comp) for r in dedup.connected_components_star(pairs).collect()}
    assert a == b and len(a) > 0

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], ["doc_a", "doc_b"]
    )
    star = {(r.id, r.comp)
            for r in dedup.connected_components_star(chain).collect()}
    assert star == {(i, 0) for i in range(201)}
    label = dedup.connected_components(chain).collect()
    assert any(r.comp != 0 for r in label)  # the documented diameter limit

    # the closure engines are interchangeable inside the collapsed
    # components operator
    kw = dict(num_hashes=16, bands=4, n=2, text_col="text", id_col="doc_id")
    sa = {tuple(r) for r in dedup.minhash_neardup_components(
        d, cc="star", **kw).collect()}
    sb = {tuple(r) for r in dedup.minhash_neardup_components(
        d, cc="label", **kw).collect()}
    assert sa == sb


def test_simhash_duplicates(spark):
    rows = [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "zzz yyy xxx www qqq")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    groups = dedup.simhash_duplicates(df).collect()
    assert len(groups) == 1 and groups[0].n_docs == 2


def test_simhash_null_text_buckets_at_zero(spark):
    """Null text keeps the pre-r15 0 signature (ADVICE r15): a NULL
    signature would silently drop the doc out of every band equi-join in
    simhash_near_dup_pairs / the index screens instead of bucketing."""
    df = spark.createDataFrame(
        [(1, None), (2, "alpha beta")], "doc_id bigint, text string"
    )
    sigs = {
        r.doc_id: r.s
        for r in df.select(
            "doc_id", dedup.simhash_col(F.col("text"), 16).alias("s")
        ).collect()
    }
    assert sigs[1] == 0
    assert sigs[2] is not None


def test_grouping_and_metrics(tables):
    emb = tables["embeddings"]
    qv = [r for r in emb.filter(F.col("vec_id") == 0).head().embedding]
    scored = knn.with_similarity(emb, qv)
    top2 = grouping.top_n_per_group(scored, "label", 2, id_col="vec_id")
    counts = top2.groupBy("label").count().collect()
    assert all(r["count"] <= 2 for r in counts)
    dist = metrics.distribution(tables["documents"], "lang", limit=3).collect()
    assert len(dist) == 3 and dist[0].n >= dist[1].n >= dist[2].n


def test_connected_components_chain_and_clique(spark):
    from ocr_vector_db_spark.operators.dedup import connected_components

    # chain 1-2-3 (transitive merge), clique 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {r.id: r.comp for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_pagerank_triangle_uniform(spark):
    """On a regular (triangle) graph PageRank is exactly uniform."""
    from ocr_vector_db_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]],
        "src bigint, dst bigint",
    )
    got = {r.id: r.rank for r in pagerank(edges, iterations=4, cache=False).collect()}
    assert set(got) == {1, 2, 3}
    for v in got.values():
        assert abs(v - 1 / 3) < 1e-6


def test_pagerank_star_center_dominates(spark):
    """Star graph: the hub accumulates rank mass; ranks sum to ~1."""
    from ocr_vector_db_spark.operators.graph import pagerank

    leaves = [2, 3, 4, 5]
    e = [(1, x) for x in leaves] + [(x, 1) for x in leaves]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    got = {r.id: r.rank for r in pagerank(edges, iterations=6, cache=False).collect()}
    assert got[1] > max(got[x] for x in leaves)
    assert abs(sum(got.values()) - 1.0) < 1e-3


def test_pagerank_dangling_default_fails_loudly(spark):
    """A node with no outgoing edges leaks rank mass silently; the default
    mode must refuse instead (judge round-6 item #7)."""
    import pytest

    from ocr_vector_db_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)],  # node 3 has no out-edges
        "src bigint, dst bigint",
    )
    with pytest.raises(ValueError, match="out-degree 0"):
        pagerank(edges, iterations=2, cache=False).collect()


def test_pagerank_redistribute_matches_numpy_and_conserves_mass(spark):
    """dangling='redistribute' implements the classic Brin-Page handling:
    the dangling sum is shared to every node, so total mass stays ~1 and
    values match a dense numpy power iteration with the same rounding."""
    import numpy as np

    from ocr_vector_db_spark.operators.graph import pagerank

    # 1->2, 2->{1,3}, 4->3; 3 is dangling (in-edges only)
    e = [(1, 2), (2, 1), (2, 3), (4, 3)]
    edges = spark.createDataFrame(e, "src bigint, dst bigint")
    got = {
        r.id: r.rank
        for r in pagerank(
            edges, iterations=6, cache=False, dangling="redistribute"
        ).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert abs(sum(got.values()) - 1.0) < 1e-3

    ids = [1, 2, 3, 4]
    n = len(ids)
    out = {1: [2], 2: [1, 3], 3: [], 4: [3]}
    r = {i: round(1 / n, 9) for i in ids}
    for _ in range(6):
        contrib = {i: 0.0 for i in ids}
        for srcn, dsts in out.items():
            for d in dsts:
                contrib[d] += round(r[srcn] / len(dsts), 9)
        share = round(sum(r[i] for i in ids if not out[i]) / n, 9)
        r = {
            i: round(0.15 / n + 0.85 * (round(contrib[i], 9) + share), 9)
            for i in ids
        }
    for i in ids:
        assert abs(got[i] - r[i]) < 1e-8, (i, got[i], r[i])


def test_simhash_band_widths_partition_bits():
    """Bands cover all B bits contiguously, widths differ by at most 1."""
    for bits, r in [(16, 0), (16, 2), (64, 3), (64, 7), (16, 15)]:
        spans = dedup.simhash_band_widths(bits, r)
        assert len(spans) == r + 1
        lo = 0
        for start, w in spans:
            assert start == lo and w >= 1
            lo += w
        assert lo == bits
        widths = [w for _, w in spans]
        assert max(widths) - min(widths) <= 1


def test_simhash_near_dup_pairs_matches_bruteforce(spark):
    """Pigeonhole banding is exact: output == all-pairs hamming <= r."""
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),
        (3, "alpha beta gamma delta zeta"),
        (4, "totally unrelated words qqq www eee"),
        (5, "alpha beta gamma delta epsilon eta"),
        (6, "lorem ipsum dolor sit amet consectetur"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in (0, 2, 4):
        got = {
            (p.doc_a, p.doc_b, p.hamming)
            for p in dedup.simhash_near_dup_pairs(df, bits=16, r=r).collect()
        }
        sigs = {
            row.doc_id: row.sig
            for row in df.select(
                "doc_id", dedup.simhash_col(F.col("text"), 16).alias("sig")
            ).collect()
        }
        want = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= r
        }
        assert got == want, f"r={r}"


def test_bm25_matches_hand_formula(spark):
    """BM25 on a 3-doc corpus equals the textbook formula computed in python."""
    import math

    from ocr_vector_db_spark.operators.retrieval import bm25_scores

    rows = [
        (1, "spark shuffle join spark spark"),
        (2, "join scan filter window"),
        (3, "python pandas numpy"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.id: r.bm25 for r in bm25_scores(df, ["spark", "join"]).collect()}
    docs = {i: t.split() for i, t in rows}
    n, avgdl = 3, sum(len(w) for w in docs.values()) / 3
    dfreq = {"spark": 1, "join": 2}
    k1, b = 1.2, 0.75
    for did, words in docs.items():
        exp = 0.0
        for t in ("join", "spark"):
            tf = words.count(t)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            part = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(words) / avgdl))
            exp += round(idf * part, 6)
        if exp:
            assert abs(got[did] - round(exp, 6)) < 1e-9, did
        else:
            assert did not in got
    assert 3 not in got  # no query term -> no row


def test_rrf_fusion_orders_consensus_first(spark):
    """A doc ranked mid by BOTH systems outfuses a doc ranked #1 by one."""
    from ocr_vector_db_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["id", "rank"])
    b = spark.createDataFrame([(20, 1), (11, 2), (12, 3)], ["id", "rank"])
    out = {r.id: (r.rrf, r.n_systems, r.fused_rank)
           for r in rrf_fuse({"a": a, "b": b}).collect()}
    assert out[11][1] == 2 and out[10][1] == 1
    assert out[11][0] == round(2 * round(1 / 62, 6), 6)
    assert out[11][2] == 1  # consensus mid-ranker fuses above either solo #1
    assert out[10][2] < out[20][2]  # equal-score tie broken by id


def test_pack_documents_boundary_overflow(spark):
    """A doc straddling the budget belongs to the pack its FIRST token is in;
    the next doc opens the next pack."""
    from ocr_vector_db_spark.operators.packing import pack_documents, pack_stats

    rows = [(1, "w " * 100, "en"), (2, "w " * 100, "en"),
            (3, "w " * 100, "en"), (4, "w " * 50, "en"), (5, "w " * 10, "fr")]
    df = spark.createDataFrame(
        [(i, t.strip(), g) for i, t, g in rows], ["doc_id", "text", "lang"])
    packed = {r.doc_id: (r.pack_id, r.cum_tokens)
              for r in pack_documents(df, budget=128, shard_col="lang").collect()}
    assert packed[1] == (0, 100)   # starts at 0
    assert packed[2] == (0, 200)   # starts at 100 < 128 -> pack 0 (overflow)
    assert packed[3] == (1, 300)   # starts at 200 -> pack 1
    assert packed[4] == (2, 350)   # starts at 300 -> pack 2
    assert packed[5] == (0, 10)    # fr shard packs independently
    stats = {(r.shard, r.pack_id): (r.n_docs, r.pack_tokens)
             for r in pack_stats(
                 pack_documents(df, budget=128, shard_col="lang"), 128).collect()}
    assert stats[("en", 0)] == (2, 200) and stats[("fr", 0)] == (1, 10)


def test_semantic_dedup_pairwise_not_transitive(spark):
    """Chain A~B~C with A!~C: B and C both drop (pairwise greedy rule),
    only A survives; an isolated far vector always survives."""
    from ocr_vector_db_spark.operators.dedup import semantic_dedup_survivors

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9806, 0.196], 0),   # cos(1,2) ~ 0.9806 >= 0.95
        (3, [0.9239, 0.3827], 0),  # cos(2,3) ~ 0.981, cos(1,3) ~ 0.924 < 0.95
        (4, [0.0, 1.0], 0),
        (9, [1.0, 0.0], 1),        # other block: never compared to label 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = sorted(r.vec_id for r in
                 semantic_dedup_survivors(df, threshold=0.95, block_col="label").collect())
    assert got == [1, 4, 9]


def test_semantic_dedup_kmeans_blocking(spark):
    """kmeans_clusters=N blocks by a seeded KMeans assignment (Abbas et al.
    §3): two tight far-apart groups land in separate clusters, each keeps
    only its min-id representative; assignment is deterministic per seed."""
    from ocr_vector_db_spark.operators.dedup import (
        kmeans_blocks,
        semantic_dedup_survivors,
    )

    rows = [
        (1, [1.0, 0.01]), (2, [0.999, 0.02]), (3, [0.998, 0.0]),   # group A
        (11, [0.0, 1.0]), (12, [0.01, 0.999]), (13, [0.02, 0.998]),  # group B
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = sorted(
        r.vec_id
        for r in semantic_dedup_survivors(
            df, threshold=0.95, block_col=None, kmeans_clusters=2
        ).collect()
    )
    assert got == [1, 11]
    # deterministic assignment: same seed -> same clusters both calls
    a = {r.vec_id: r.sem_cluster for r in kmeans_blocks(df, 2).collect()}
    b = {r.vec_id: r.sem_cluster for r in kmeans_blocks(df, 2).collect()}
    assert a == b
    assert len({a[1], a[11]}) == 2  # the two groups are split


def test_duplicate_ngram_coverage_shared_vs_unique(spark):
    """Docs sharing a 3-gram run get partial coverage; a fully-unique doc
    gets 0; identical docs get 1."""
    from ocr_vector_db_spark.operators.dedup import duplicate_ngram_coverage

    rows = [
        (1, "alpha beta gamma delta"),        # shares 'alpha beta gamma' w/ 2
        (2, "alpha beta gamma epsilon"),
        (3, "zeta eta theta iota kappa"),     # unique
        (4, "mu nu xi"),                      # identical pair -> coverage 1
        (5, "mu nu xi"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_shingles, r.n_shared, r.dup_coverage)
           for r in duplicate_ngram_coverage(df, n=3).collect()}
    assert got[1] == (2, 1, 0.5)      # 'alpha beta gamma' shared of 2 shingles
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (3, 0, 0.0)
    assert got[4] == (1, 1, 1.0)
    assert got[5] == (1, 1, 1.0)


def test_rerank_stub_is_deterministic_and_bounded(spark):
    """Stub rerank keeps k rows, ranks by the md5 hex key desc, ids break
    ties, and the same input always produces the same output."""
    import hashlib

    from ocr_vector_db_spark.operators.retrieval import md5_stub_scorer, rerank_topk

    rows = [(i, f"doc body {i}") for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = rerank_topk(df, md5_stub_scorer("q"), k=5).collect()
    assert len(out) == 5
    exp = sorted(
        ((hashlib.md5(f"q|doc body {i}".encode()).hexdigest()[:8], i) for i in range(20)),
        key=lambda t: (t[0], -t[1]), reverse=True)[:5]
    assert [(r.ce_score, r.id) for r in out] == [(h, i) for h, i in exp]
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]


def test_ngram_lm_bigrams_and_scoring(spark):
    """adjacent_bigrams: position-exact pairs after empty-token removal;
    <2-token docs contribute nothing. PMI floors hapax pairs via
    min_count; the bigram LM scores repeated boilerplate LOWER
    cross-entropy than a one-off sentence."""
    from ocr_vector_db_spark.operators import ngram_lm

    docs = spark.createDataFrame(
        [
            (1, "The quick -- brown FOX!"),
            (2, "solo"),
            (3, ""),
            (4, "the quick brown fox"),
            (5, "the quick brown fox"),
            (6, "zebra quark flux vortex"),
        ],
        "doc_id bigint, text string",
    )
    bg = ngram_lm.adjacent_bigrams(docs)
    got = {(r.doc_id, r.tok_a, r.tok_b) for r in bg.collect()}
    assert (1, "the", "quick") in got and (1, "quick", "brown") in got
    assert not any(d in (2, 3) for d, _, _ in got)
    assert len([1 for d, _, _ in got if d == 1]) == 3  # punctuation skipped

    pmi = ngram_lm.pmi_collocations(docs, min_count=3, top_k=10).collect()
    pairs = {(r.tok_a, r.tok_b) for r in pmi}
    # the 3x repeated phrase survives the floor; the hapax chain doesn't
    assert ("quick", "brown") in pairs
    assert ("zebra", "quark") not in pairs
    assert all(pmi[i].pmi >= pmi[i + 1].pmi for i in range(len(pmi) - 1))

    ce = {r.doc_id: r.avg_neg_logprob
          for r in ngram_lm.bigram_cross_entropy(docs).collect()}
    assert set(ce) == {1, 4, 5, 6}  # no-bigram docs emit no row
    assert ce[4] == ce[5] < ce[6]  # boilerplate scores lower than novelty


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """A-ES top-k: deterministic across calls, excludes non-positive
    weights, and a dominating weight is always selected."""
    from ocr_vector_db_spark.operators import sampling

    rows = [(i, 1) for i in range(200)] + [(900, 10**9), (901, 0), (902, -5)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    s1 = sampling.weighted_sample(df, 20, "w").collect()
    s2 = sampling.weighted_sample(df, 20, "w").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    ids = {r.doc_id for r in s1}
    assert len(s1) == 20 and 900 in ids  # w=1e9: key ~ 0, always on top
    assert not ids & {901, 902}  # non-positive weights excluded
    # a different salt draws a different sample (same determinism)
    s3 = sampling.weighted_sample(df, 20, "w", salt="other").collect()
    assert {r.doc_id for r in s3} != ids or s3 != s1


def test_standardize_embeddings_unit_norm_and_centered(spark):
    """Standardized corpus: every output vector is unit-L2 (pre-round),
    each dimension's mean is ~0 across the corpus, and a precomputed
    stats profile reproduces the fit-on-self output."""
    import numpy as np

    from ocr_vector_db_spark.operators import embedding_prep

    rng = np.random.default_rng(11)
    X = rng.normal(loc=[5.0, -2.0, 0.5, 0.0], scale=[10.0, 0.1, 1.0, 2.0],
                   size=(100, 4))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id bigint, embedding array<double>",
    )
    out = {r.vec_id: r.unit_std
           for r in embedding_prep.standardize_embeddings(df).collect()}
    Z = np.array([out[i] for i in range(100)])
    assert np.allclose((Z ** 2).sum(axis=1), 1.0, atol=1e-4)
    # standardization removed the per-dim offset/scale imbalance: each
    # dim's corpus mean is near 0 relative to its spread
    assert np.abs(Z.mean(axis=0)).max() < 0.05

    stats = embedding_prep.dim_stats(df)
    again = {r.vec_id: r.unit_std
             for r in embedding_prep.standardize_embeddings(
                 df, stats=stats).collect()}
    assert again == out


def test_fold_sample_equals_union_draw(spark, tmp_path):
    """Streaming A-ES fold: folding per-batch top-k state over N batches
    yields EXACTLY weighted_sample over the union — same rows, same keys
    — and re-folding a batch (replay) is a no-op."""
    from ocr_vector_db_spark.operators import sampling

    batches = [
        spark.createDataFrame(
            [(i, (i * 7) % 13 + 1) for i in range(lo, hi)],
            "doc_id bigint, w bigint",
        )
        for lo, hi in [(0, 70), (70, 150), (150, 260)]
    ]
    folded = None
    for b in batches:
        folded = sampling.fold_sample(folded, b, 25, "w")
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = [tuple(r) for r in sampling.weighted_sample(union, 25, "w").collect()]
    assert [tuple(r) for r in folded.collect()] == want

    refold = sampling.fold_sample(folded, batches[1], 25, "w")  # replay
    assert [tuple(r) for r in refold.collect()] == want

    # persisted state: RunningSample folds across instances and survives
    # reload; state is always <= k rows
    rs = sampling.RunningSample(spark, str(tmp_path / "s"), 25, "w")
    assert rs.current() is None
    for b in batches[:2]:
        rs.fold(b)
    rs2 = sampling.RunningSample(spark, str(tmp_path / "s"), 25, "w")
    rs2.fold(batches[2])
    assert [tuple(r) for r in rs2.current().collect()] == want
    assert rs2.current().count() == 25


def test_duplicate_span_excision_semantics(spark):
    import hashlib

    from ocr_vector_db_spark.operators.dedup import duplicate_span_excision

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "zzz one two three four qqq"),
            (3, "p q r p q r p q r"),          # self-repeating
            (4, "aa bb cc"),                    # unique — no spans
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r
        for r in duplicate_span_excision(docs, n=3).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731

    # doc 4 has no duplicated 3-gram anywhere → absent
    assert set(got) == {1, 2, 3}

    # docs 1/2 share "one two three" and "two three four": doc 1's hits
    # at positions 0,1 merge into [0,4) (kept: "five six"); doc 2's at
    # 1,2 into [1,5) (kept: "zzz" + "qqq")
    r1 = got[1]
    assert (r1.n_tokens, r1.n_spans, r1.removed_tokens, r1.kept_tokens) \
        == (6, 1, 4, 2)
    assert r1.spans_digest == md5("000000-000004")
    assert r1.kept_digest == md5("five six")
    r2 = got[2]
    assert (r2.n_tokens, r2.n_spans, r2.removed_tokens, r2.kept_tokens) \
        == (6, 1, 4, 2)
    assert r2.spans_digest == md5("000001-000005")
    assert r2.kept_digest == md5("zzz qqq")

    # doc 3: every 3-gram repeats within the doc → the whole doc is one
    # span and nothing survives
    r3 = got[3]
    assert (r3.n_tokens, r3.n_spans, r3.removed_tokens, r3.kept_tokens) \
        == (9, 1, 9, 0)
    assert r3.spans_digest == md5("000000-000009")
    assert r3.kept_digest == md5("")


def test_stratified_sample_exact_allocation(spark):
    from ocr_vector_db_spark.operators import sampling
    import hashlib

    # skewed strata: 60/25/10/5 — Hamilton allocation of 20 seats
    rows = []
    for s, n in [("a", 60), ("b", 25), ("c", 10), ("d", 5)]:
        rows += [(s, i + 1000 * ord(s[0])) for i in range(n)]
    df = spark.createDataFrame(rows, "g string, doc_id bigint")
    out = sampling.stratified_sample(df, ["g"], 20, id_col="doc_id").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    # quotas: floor(20*ns/100) = 12/5/2/1, sum=20, leftover=0
    assert {g: len(v) for g, v in by_g.items()} == \
        {"a": 12, "b": 5, "c": 2, "d": 1}
    # within-stratum winners are the md5-smallest ids, ranks 1..quota
    for g, picked in by_g.items():
        ids = [r.doc_id for r in df.filter(F.col("g") == g).collect()]
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"strat#{i}".encode()).hexdigest(), i)
        )
        want = set(order[: len(picked)])
        assert {r.doc_id for r in picked} == want
        assert sorted(r.strat_rank for r in picked) == \
            list(range(1, len(picked) + 1))
    # deterministic across runs
    again = sampling.stratified_sample(df, ["g"], 20, id_col="doc_id").collect()
    assert sorted((r.g, r.doc_id) for r in again) == \
        sorted((r.g, r.doc_id) for r in out)


def test_stratified_sample_largest_remainder_and_exhaustion(spark):
    from ocr_vector_db_spark.operators import sampling

    # 7 seats over 3+3+1 rows: floors are 3/3/1 scaled... use total=5:
    # floor(5*3/7)=2 rem 1, floor(5*3/7)=2 rem 1, floor(5*1/7)=0 rem 5
    # leftover = 5-4 = 1 → goes to 'c' (largest remainder)
    rows = [("a", 1), ("a", 2), ("a", 3),
            ("b", 4), ("b", 5), ("b", 6), ("c", 7)]
    df = spark.createDataFrame(rows, "g string, doc_id bigint")
    out = sampling.stratified_sample(df, ["g"], 5, id_col="doc_id").collect()
    counts = {}
    for r in out:
        counts[r.g] = counts.get(r.g, 0) + 1
    assert counts == {"a": 2, "b": 2, "c": 1}
    assert len(out) == 5
    # total == corpus size → everything sampled (quota clamped to ns)
    full = sampling.stratified_sample(df, ["g"], 7, id_col="doc_id").collect()
    assert len(full) == 7


def test_psi_report_hand_computed_and_invariances(spark):
    import math

    from ocr_vector_db_spark.operators.drift import psi_report

    # hand-computed: A = {0..9} uniform, B = {0..4} only, bins=5,
    # min=0 max=9 → bin = v*5 div 10 → two values per bin
    rows = [(True, v) for v in range(10)] + [(False, v) for v in range(5)]
    df = spark.createDataFrame(rows, "a boolean, v bigint")
    got = psi_report(df, F.col("a"), "v", bins=5).head()
    na, nb, B = 10, 5, 5
    ca = [2] * 5
    cb = [2, 2, 1, 0, 0]
    want = 0.0
    want_jsd = 0.0
    for i in range(B):
        pa = (ca[i] + 0.5) / (na + B / 2)
        pb = (cb[i] + 0.5) / (nb + B / 2)
        want += round((pa - pb) * math.log(pa / pb), 9)
        m = (pa + pb) / 2.0
        want_jsd += round(
            (pa * math.log(pa / m) + pb * math.log(pb / m)) / 2.0, 9
        )
    assert (got.n_a, got.n_b, got.n_bins) == (10, 5, 5)
    assert got.psi == round(want, 6)
    assert got.jsd == round(want_jsd, 6)

    # identical slices → PSI exactly 0 (terms cancel bin by bin)
    same = [(s, v) for s in (True, False) for v in range(20)]
    z = psi_report(
        spark.createDataFrame(same, "a boolean, v bigint"),
        F.col("a"), "v", bins=4,
    ).head()
    assert z.psi == 0.0 and z.jsd == 0.0

    # gross shift → PSI well past the 0.25 'shifted' threshold
    shifted = [(True, v) for v in range(100)] + \
              [(False, 900 + v) for v in range(100)]
    s = psi_report(
        spark.createDataFrame(shifted, "a boolean, v bigint"),
        F.col("a"), "v", bins=10,
    ).head()
    assert s.psi > 0.25
    assert 0.25 < s.jsd <= math.log(2) + 1e-9  # JSD is ln2-bounded


def test_drift_baseline_fold_and_frozen_bins(spark, tmp_path):
    from ocr_vector_db_spark.operators.drift import DriftBaseline
    from ocr_vector_db_spark.operators.index_maint import (
        committed_generations,
    )

    base = spark.createDataFrame(
        [(v,) for v in range(100)], "n_chars bigint"
    )
    path = str(tmp_path / "bl")
    bl = DriftBaseline.build(spark, base, "n_chars", path, bins=10)

    # self-screen: folding the EXACT baseline distribution → psi 0
    r = bl.psi_of(base, "n_chars").head()
    assert (r.n_base, r.n_batch, r.psi) == (100, 100, 0.0)

    # out-of-range batch clamps into edge bins (bins frozen at build)
    hot = spark.createDataFrame(
        [(v,) for v in range(1000, 1050)], "n_chars bigint"
    )
    r2 = bl.psi_of(hot, "n_chars").head()
    assert r2.n_batch == 50 and r2.psi > 0.25  # gross shift flagged

    # fold: counts add under frozen bins, generations advance + GC
    bl.fold(base, "n_chars")
    assert committed_generations(spark, path + "/state") == [1, 2]
    r3 = bl.psi_of(base, "n_chars").head()
    assert r3.n_base == 200 and r3.psi == 0.0  # doubled counts, same mix
    bl.fold(hot, "n_chars")
    assert committed_generations(spark, path + "/state") == [2, 3]
    assert bl.psi_of(base, "n_chars").head().n_base == 250


def test_embedding_drift_semantics(spark):
    from ocr_vector_db_spark.operators.drift import embedding_drift

    # identical slice means → cosine exactly 1, shift 0
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = embedding_drift(df, F.col("vec_id") % 2 == 0).head()
    assert (r.n_a, r.n_b, r.dim) == (4, 4, 3)
    assert r.mean_cosine == 1.0 and r.max_dim_shift == 0.0

    # orthogonal slice means → cosine 0; shift = the moved coordinate
    rows = [(0, [2.0, 0.0]), (2, [2.0, 0.0]),
            (1, [0.0, 3.0]), (3, [0.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    r = embedding_drift(df, F.col("vec_id") % 2 == 0).head()
    assert r.mean_cosine == 0.0 and r.max_dim_shift == 3.0

    # opposite directions → cosine -1
    rows = [(0, [1.0, 1.0]), (1, [-1.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    assert embedding_drift(df, F.col("vec_id") % 2 == 0).head().mean_cosine \
        == -1.0


def test_embedding_near_dup_quadratic_needs_explicit_opt_in(spark):
    """The unblocked path is an O(n^2) cross join — it must raise unless
    the caller opts in with allow_quadratic=True (VERDICT r12: a future
    call site can't stumble into the quadratic plan silently). The
    opted-in result equals the blocked result on a single-block corpus."""
    import pytest as _pytest

    from ocr_vector_db_spark.operators.dedup import (
        embedding_near_dup_pairs,
        semantic_dedup_survivors,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9806, 0.196], 0),
        (4, [0.0, 1.0], 0),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    with _pytest.raises(ValueError, match="allow_quadratic"):
        embedding_near_dup_pairs(df, threshold=0.95)
    with _pytest.raises(ValueError, match="allow_quadratic"):
        semantic_dedup_survivors(df, threshold=0.95, block_col=None)

    quad = sorted(
        (p.id_a, p.id_b)
        for p in embedding_near_dup_pairs(
            df, threshold=0.95, allow_quadratic=True).collect()
    )
    blocked = sorted(
        (p.id_a, p.id_b)
        for p in embedding_near_dup_pairs(
            df, threshold=0.95, block_col="label").collect()
    )
    assert quad == blocked == [(1, 2)]


def test_spread_probe_decision_matches_rdd_probe(spark, tables):
    """The file-stats partition estimate (optimization r16 — replaces the
    per-call df.rdd physical-planning probe) must land on the same side of
    the defaultParallelism floor as the real scan partitioning, for every
    driver table shape; non-file plans keep the RDD probe verbatim."""
    from ocr_vector_db_spark.session import _est_scan_partitions

    target = spark.sparkContext.defaultParallelism
    for name in ("documents", "embeddings", "lineitem", "orders"):
        df = tables[name].select(tables[name].columns[:2])
        est = _est_scan_partitions(df)
        actual = df.rdd.getNumPartitions()
        assert (est >= target) == (actual >= target), (name, est, actual)
    local = spark.createDataFrame([(1,)], "a int")
    assert _est_scan_partitions(local) == local.rdd.getNumPartitions()
