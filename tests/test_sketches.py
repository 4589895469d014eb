"""Approximate sketches: the 100 TB path where exact distinct/quantile
aggregation is unaffordable. Error bounds are asserted against exact answers
on data large enough for the estimators to engage their compressed regimes."""

from pyspark.sql import functions as F


def test_hll_distinct_error_bound(spark):
    n = 50_000
    df = spark.range(n).select((F.col("id") % 9973).alias("k"))  # 9973 distinct
    est = df.agg(F.approx_count_distinct("k", rsd=0.02).alias("e")).head().e
    assert abs(est - 9973) / 9973 < 0.05  # rsd 2% → 5% is a safe ceiling

    # mergeable across groups: per-group sketches sum to the same ballpark
    per = (
        df.withColumn("g", F.col("k") % 4)
        .groupBy("g")
        .agg(F.approx_count_distinct("k", rsd=0.02).alias("e"))
    )
    assert abs(sum(r.e for r in per.collect()) - 9973) / 9973 < 0.05


def test_approx_percentile_accuracy(spark):
    n = 100_000
    df = spark.range(n).select(F.col("id").cast("double").alias("v"))
    got = df.agg(
        F.percentile_approx("v", [0.5, 0.95, 0.99], 10_000).alias("p")
    ).head().p
    for q, g in zip([0.5, 0.95, 0.99], got):
        assert abs(g - q * (n - 1)) <= n * 0.01  # 1% rank error at acc=10k


def test_count_min_heavy_hitter(spark):
    # skewed stream: key 7 is ~50% of traffic; CMS overestimates only
    df = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 500).alias("k")
    )
    sk = df.agg(
        F.count_min_sketch(F.col("k"), F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).head().s
    assert sk is not None and len(bytes(sk)) > 0  # mergeable binary sketch
    exact = df.filter(F.col("k") == 7).count()
    assert exact == 10_040  # 10k even ids + 40 odd ids ≡ 7 (mod 500)


# ---------------------------------------------------------------------------
# Persisted HLL register sketch (operators/sketches.py) — exact register
# semantics (vs a pure-Python reference), incremental/merge folds, and the
# generation-pointer lifecycle.
# ---------------------------------------------------------------------------

def _py_registers(keys, p):
    """Pure-Python reference for hll_registers: md5-hex arithmetic."""
    import hashlib

    bchars = p // 4
    rchars = 16 - bchars
    regs = {}
    for k in keys:
        h = hashlib.md5(str(k).encode()).hexdigest()
        bucket = int(h[:bchars], 16)
        rest = h[bchars:16]
        trimmed = rest.lstrip("0")
        if not trimmed:
            rho = 4 * rchars + 1
        else:
            nib = int(trimmed[0], 16)
            lz = 3 if nib == 1 else 2 if nib < 4 else 1 if nib < 8 else 0
            rho = (rchars - len(trimmed)) * 4 + lz + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return sorted(regs.items())


def test_hll_registers_match_python_reference(spark):
    from ocr_vector_db_spark.operators.sketches import hll_registers

    keys = [f"tok{i}" for i in range(500)] + ["", "0", "zzz", "한국어"]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    for p in (4, 8, 12):
        got = sorted(
            (r.bucket, r.r)
            for r in hll_registers(df, F.col("k"), p).collect()
        )
        assert got == _py_registers(keys, p), f"p={p}"


def test_hll_build_add_merge_equals_scratch(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import (
        HLLSketch, hll_registers,
    )

    df = spark.range(3000).select(
        F.concat(F.lit("k"), (F.col("id") % 1100).cast("string")).alias("k")
    )
    a = df.filter(F.col("id") % 3 == 0)
    b = df.filter(F.col("id") % 3 == 1)
    c = df.filter(F.col("id") % 3 == 2)

    sk = HLLSketch.build(spark, a, str(tmp_path / "a"), F.col("k"), p=8)
    sk.add(b, F.col("k"))
    other = HLLSketch.build(spark, c, str(tmp_path / "c"), F.col("k"), p=8)
    sk.merge(other)

    scratch = sorted(
        (r.bucket, r.r)
        for r in hll_registers(df, F.col("k"), 8).collect()
    )
    folded = sorted((r.bucket, r.r) for r in sk.registers().collect())
    assert folded == scratch

    # load() round-trip serves the same summary row
    row = HLLSketch.load(spark, str(tmp_path / "a")).summary().head()
    assert row.m == 256 and row.reg_digest is not None

    # idempotent re-fold: replaying a batch cannot move a register
    sk.add(b, F.col("k"))
    assert sorted((r.bucket, r.r) for r in sk.registers().collect()) == scratch


def test_hll_estimate_accuracy_and_empty(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import HLLSketch

    n_distinct = 5000
    df = spark.range(n_distinct * 2).select(
        F.concat(F.lit("u"), (F.col("id") % n_distinct).cast("string"))
        .alias("k")
    )
    sk = HLLSketch.build(spark, df, str(tmp_path / "e"), F.col("k"), p=8)
    est = sk.estimate()
    assert abs(est - n_distinct) / n_distinct < 0.20  # ~6.5% rse at p=8

    empty = HLLSketch.build(
        spark, df.filter(F.lit(False)), str(tmp_path / "z"), F.col("k"), p=8
    )
    row = empty.summary().head()
    assert row.v == 256 and float(row.est) == 0.0


def test_kmv_build_add_merge_equals_scratch_and_exact_regime(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import KMVSketch, kmv_minima

    df = spark.range(4000).select(
        F.concat(F.lit("v"), (F.col("id") % 900).cast("string")).alias("k")
    )
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 == 1)
    sk = KMVSketch.build(spark, a, str(tmp_path / "a"), F.col("k"), k=64)
    sk.add(b, F.col("k"))
    scratch = [r.h for r in kmv_minima(df, F.col("k"), 64).collect()]
    assert sorted(r.h for r in sk.minima().collect()) == sorted(scratch)

    # idempotent re-add
    sk.add(b, F.col("k"))
    assert sorted(r.h for r in sk.minima().collect()) == sorted(scratch)

    # merge fold ≡ scratch over the union
    c = spark.range(500).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("k")
    )
    other = KMVSketch.build(spark, c, str(tmp_path / "c"), F.col("k"), k=64)
    sk.merge(other)
    u = df.select("k").unionByName(c.select("k"))
    assert sorted(r.h for r in sk.minima().collect()) == sorted(
        r.h for r in kmv_minima(u, F.col("k"), 64).collect()
    )

    # exact regime: fewer distincts than k → estimate is the exact count
    small = spark.range(40).select(F.col("id").cast("string").alias("k"))
    ex = KMVSketch.build(spark, small, str(tmp_path / "s"), F.col("k"), k=64)
    assert ex.estimate() == 40.0

    # estimator regime accuracy: the sketch at "a" has been folded to
    # df ∪ c = 900 + 500 = 1400 distincts (rse ≈ 1/sqrt(64) ≈ 12.5%)
    est = KMVSketch.load(spark, str(tmp_path / "a")).estimate()
    assert abs(est - 1400) / 1400 < 0.40


def test_kmv_set_relations_semantics(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import (
        KMVSketch, kmv_set_relations,
    )

    base = spark.range(600).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("k")
    )
    subset = base.filter(F.col("id") < 300)
    disjoint = spark.range(600).select(
        F.concat(F.lit("y"), F.col("id").cast("string")).alias("k")
    )
    a = KMVSketch.build(spark, base, str(tmp_path / "a"), F.col("k"), k=128)
    s = KMVSketch.build(spark, subset, str(tmp_path / "s"), F.col("k"), k=128)
    dj = KMVSketch.build(spark, disjoint, str(tmp_path / "d"), F.col("k"),
                         k=128)

    row = kmv_set_relations(a, s).head()
    assert row.n_union == 128 and row.inter_cnt > 0
    # subset containment: every merged minimum in S is also in A, so the
    # intersection ratio estimates |S|/|A∪S| = 0.5 — loose bound
    assert 0.2 < row.jaccard < 0.8
    assert row.union_est > 0 and row.inter_est < row.union_est

    row2 = kmv_set_relations(a, dj).head()
    assert row2.inter_cnt == 0 and row2.jaccard == 0.0 and row2.inter_est == 0.0

    # mismatched k is refused
    bad = KMVSketch.build(spark, base, str(tmp_path / "b"), F.col("k"), k=64)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        kmv_set_relations(a, bad)


# ---------------------------------------------------------------------------
# Persisted Bloom filter (operators/sketches.py) — one-sided error, exact
# word semantics vs a pure-Python reference, OR-idempotent folds, and the
# broadcast screen.
# ---------------------------------------------------------------------------

def _py_bloom_words(keys, m, k):
    """Pure-Python reference for bloom_words: md5-hex arithmetic."""
    import hashlib

    words = {}
    for key in keys:
        for j in range(k):
            h = hashlib.md5(f"{j}#{key}".encode()).hexdigest()
            pos = int(h[:13], 16) % m
            w, b = pos // 60, pos % 60
            words[w] = words.get(w, 0) | (1 << b)
    return sorted(words.items())


def test_bloom_words_match_python_reference(spark):
    from ocr_vector_db_spark.operators.sketches import bloom_words

    keys = [f"gram {i}" for i in range(300)] + ["", "한국어 토큰", "0"]
    df = spark.createDataFrame([(s,) for s in keys], ["s"])
    got = sorted(
        (r.word_idx, r.bits)
        for r in bloom_words(df, F.col("s"), 8160, 3).collect()
    )
    assert got == _py_bloom_words(keys, 8160, 3)


def test_bloom_no_false_negatives_and_sane_fp(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import BloomSketch

    members = spark.range(400).select(
        F.concat(F.lit("in"), F.col("id").cast("string")).alias("s")
    )
    sk = BloomSketch.build(
        spark, members, str(tmp_path / "bf"), F.col("s"), m=8160, k=3
    )
    # every member answers True — the one-sided-error contract
    hits = sk.screen(members, F.col("s")).filter(~F.col("maybe_member"))
    assert hits.count() == 0
    # non-members mostly answer False (kn/m≈0.15 → FP ≈ 0.25%; allow 2%)
    out = spark.range(2000).select(
        F.concat(F.lit("out"), F.col("id").cast("string")).alias("s")
    )
    fp = sk.screen(out, F.col("s")).filter(F.col("maybe_member")).count()
    assert fp <= 40, fp


def test_bloom_build_add_merge_equals_scratch(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import (
        BloomSketch, bloom_words,
    )

    df = spark.range(900).select(
        F.concat(F.lit("g"), (F.col("id") % 700).cast("string")).alias("s")
    )
    a = df.filter(F.col("id") % 3 == 0)
    b = df.filter(F.col("id") % 3 == 1)
    c = df.filter(F.col("id") % 3 == 2)

    sk = BloomSketch.build(spark, a, str(tmp_path / "a"), F.col("s"), m=4020, k=4)
    sk.add(b, F.col("s"))
    sk.add(b, F.col("s"))  # replay: OR-idempotent, must not flip a bit
    other = BloomSketch.build(
        spark, c, str(tmp_path / "c"), F.col("s"), m=4020, k=4
    )
    sk.merge(other)

    got = sorted((r.word_idx, r.bits) for r in
                 BloomSketch.load(spark, str(tmp_path / "a")).words().collect())
    scratch = sorted((r.word_idx, r.bits) for r in
                     bloom_words(df, F.col("s"), 4020, 4).collect())
    assert got == scratch

    import pytest

    with pytest.raises(ValueError):
        sk.merge(BloomSketch.build(
            spark, a, str(tmp_path / "m"), F.col("s"), m=8160, k=4
        ))
    with pytest.raises(ValueError):
        BloomSketch.build(spark, a, str(tmp_path / "x"), F.col("s"), m=1000)


def test_bloom_screen_broadcast_off_same_result(spark, tmp_path):
    """broadcast=False (the > 2^34-bit path: words persisted bucketed by
    word_idx, plain equi-join) returns the identical verdict set."""
    from ocr_vector_db_spark.operators.sketches import (
        BloomSketch, bloom_screen,
    )

    members = spark.range(200).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("s")
    )
    sk = BloomSketch.build(
        spark, members, str(tmp_path / "bf2"), F.col("s"), m=8160, k=3
    )
    batch = spark.range(400).select(
        F.concat(F.lit("m"), (F.col("id") * 2).cast("string")).alias("s")
    )
    a = sorted((r.key, r.maybe_member)
               for r in sk.screen(batch, F.col("s")).collect())
    b = sorted((r.key, r.maybe_member)
               for r in bloom_screen(batch, sk.words(), sk.m, sk.k,
                                     F.col("s"), broadcast=False).collect())
    assert a == b and any(mm for _, mm in a) and not all(mm for _, mm in a)


def test_bloom_words_scale_shape(spark):
    """The words aggregation's key space IS the word space: 200k input
    grams reduce to ≤ m/60 rows, and the plan shows the partial (map-side)
    bit_or BEFORE the exchange — per-task state is word-bounded, so the
    build shuffles KBs regardless of benchmark-corpus size."""
    from ocr_vector_db_spark.operators.sketches import bloom_words

    m = 60 * 1024
    grams = spark.range(200_000).select(
        F.concat(F.lit("g"), F.col("id").cast("string")).alias("s")
    )
    words = bloom_words(grams, F.col("s"), m, 3)
    plan = words._jdf.queryExecution().executedPlan().toString()
    assert "partial_bit_or" in plan
    assert plan.index("partial_bit_or") > plan.index("Exchange")  # producer below
    n = words.count()
    assert n <= 1024
    # 600k probes into 61440 bits: essentially every word is touched
    assert n >= 1000


# ---------------------------------------------------------------------------
# Persisted Count-Min sketch (operators/sketches.py) — exact cell semantics
# (vs a pure-Python reference), the one-sided estimate contract, weighted
# folds, merge linearity, and the generation-pointer lifecycle.
# ---------------------------------------------------------------------------

def _py_cm_cells(pairs, w, d):
    """Pure-Python reference for cm_cells: md5-hex arithmetic over
    (key, weight) pairs."""
    import hashlib

    cells = {}
    for key, cnt in pairs:
        for j in range(d):
            h = hashlib.md5(f"{j}@{key}".encode()).hexdigest()
            col = int(h[:13], 16) % w
            cells[(j, col)] = cells.get((j, col), 0) + cnt
    return sorted(cells.items())


def test_cm_cells_match_python_reference(spark):
    from ocr_vector_db_spark.operators.sketches import cm_cells

    rows = [(f"tok {i}", i % 5 + 1) for i in range(300)] + \
        [("", 2), ("한국어 토큰", 7), ("0", 1)]
    df = spark.createDataFrame(rows, ["s", "n"])
    got = sorted(
        ((r.row, r.col), r.cnt)
        for r in cm_cells(df, F.col("s"), 4096, 4,
                          weight=F.col("n")).collect()
    )
    assert got == _py_cm_cells(rows, 4096, 4)
    # default weight = 1 per input row
    got1 = sorted(
        ((r.row, r.col), r.cnt)
        for r in cm_cells(df, F.col("s"), 512, 2).collect()
    )
    assert got1 == _py_cm_cells([(s, 1) for s, _ in rows], 512, 2)


def test_cm_estimate_upper_bound_and_exact_regime(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import CMSketch

    # Zipf-ish corpus: key i occurs 600//(i+1) times, 60 distinct keys
    occ = spark.range(60).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("s"),
        (600 / (F.col("id") + 1)).cast("bigint").alias("n"),
    )
    exact = {r.s: r.n for r in occ.collect()}
    keys = occ.select("s")

    # tight sketch (w >> distinct keys): every estimate is exact
    big = CMSketch.build(spark, occ, str(tmp_path / "cmb"), F.col("s"),
                         w=1 << 12, d=4, weight=F.col("n"))
    for r in big.estimate(keys, F.col("s")).collect():
        assert r.est == exact[r.key], r

    # deliberately tiny sketch (w=16 < 60 keys): collisions are certain,
    # the estimate must stay an UPPER bound for every folded key
    small = CMSketch.build(spark, occ, str(tmp_path / "cms"), F.col("s"),
                           w=16, d=2, weight=F.col("n"))
    ests = {r.key: r.est for r in small.estimate(keys, F.col("s")).collect()}
    assert all(ests[k] >= exact[k] for k in exact)
    assert any(ests[k] > exact[k] for k in exact)  # one-sided error visible

    # id_cols collision guard
    import pytest

    with pytest.raises(ValueError):
        small.estimate(keys.withColumn("key", F.lit(1)),
                       F.col("s"), "key")


def test_cm_build_add_merge_equals_scratch(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import CMSketch, cm_cells

    df = spark.range(900).select(
        F.concat(F.lit("g"), (F.col("id") % 200).cast("string")).alias("s"),
        (F.col("id") % 3 + 1).alias("n"),
    )
    a = df.filter(F.col("id") % 3 == 0)
    b = df.filter(F.col("id") % 3 == 1)
    c = df.filter(F.col("id") % 3 == 2)

    sk = CMSketch.build(spark, a, str(tmp_path / "a"), F.col("s"),
                        w=256, d=3, weight=F.col("n"))
    sk.add(b, F.col("s"), weight=F.col("n"))
    other = CMSketch.build(spark, c, str(tmp_path / "c"), F.col("s"),
                           w=256, d=3, weight=F.col("n"))
    sk.merge(other)

    got = sorted((r.row, r.col, r.cnt) for r in
                 CMSketch.load(spark, str(tmp_path / "a")).cells().collect())
    scratch = sorted(
        (r.row, r.col, r.cnt)
        for r in cm_cells(df, F.col("s"), 256, 3,
                          weight=F.col("n")).collect()
    )
    assert got == scratch

    import pytest

    with pytest.raises(ValueError):
        sk.merge(CMSketch.build(
            spark, a, str(tmp_path / "m"), F.col("s"), w=512, d=3
        ))


def test_cm_estimate_broadcast_off_same_result(spark, tmp_path):
    from ocr_vector_db_spark.operators.sketches import CMSketch, cm_estimate

    occ = spark.range(150).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("s")
    )
    sk = CMSketch.build(spark, occ, str(tmp_path / "cm2"), F.col("s"),
                        w=128, d=3)
    batch = spark.range(300).select(
        F.concat(F.lit("m"), (F.col("id") * 2).cast("string")).alias("s")
    )
    a = sorted((r.key, r.est) for r in
               sk.estimate(batch, F.col("s")).collect())
    b = sorted((r.key, r.est)
               for r in cm_estimate(batch, sk.cells(), sk.w, sk.d,
                                    F.col("s"), broadcast=False).collect())
    assert a == b


def test_cm_cells_scale_shape(spark):
    """The cells aggregation's key space IS the cell space: 200k input
    tokens reduce to ≤ d·w rows, with the partial (map-side) sum BEFORE
    the exchange — per-task state is cell-bounded, so the build shuffles
    KBs regardless of corpus size."""
    from ocr_vector_db_spark.operators.sketches import cm_cells

    toks = spark.range(200_000).select(
        F.concat(F.lit("t"), (F.col("id") % 5000).cast("string")).alias("s")
    )
    cells = cm_cells(toks, F.col("s"), 1024, 4)
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # producer below
    assert cells.count() <= 4 * 1024


def test_cm_epoch_guard_exactly_once(spark, tmp_path):
    """The `_last_epoch` generation marker makes epoch-tagged folds
    exactly-once: a replayed epoch no-ops (SUM is not idempotent), the
    marker survives merges, and untagged adds still fold."""
    from ocr_vector_db_spark.operators.sketches import CMSketch, cm_cells

    occ = spark.range(50).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("s")
    )
    sk = CMSketch.build(spark, occ, str(tmp_path / "cme"), F.col("s"),
                        w=64, d=2)
    assert sk.last_epoch() == -1
    batch = spark.range(20).select(
        F.concat(F.lit("b"), F.col("id").cast("string")).alias("s")
    )
    sk.add(batch, F.col("s"), epoch=0)
    assert sk.last_epoch() == 0
    snap = sorted((r.row, r.col, r.cnt) for r in sk.cells().collect())
    sk.add(batch, F.col("s"), epoch=0)  # crash-window replay: no-op
    assert sorted((r.row, r.col, r.cnt)
                  for r in sk.cells().collect()) == snap
    sk.add(batch, F.col("s"), epoch=1)  # next epoch folds
    assert sk.last_epoch() == 1
    want = sorted(
        (r.row, r.col, r.cnt)
        for r in cm_cells(
            occ.unionByName(batch).unionByName(batch),
            F.col("s"), 64, 2,
        ).collect()
    )
    assert sorted((r.row, r.col, r.cnt)
                  for r in sk.cells().collect()) == want
    # a merge publish carries the marker forward
    other = CMSketch.build(spark, batch, str(tmp_path / "cmo"),
                           F.col("s"), w=64, d=2)
    sk.merge(other)
    assert sk.last_epoch() == 1
    sk.add(batch, F.col("s"), epoch=1)  # still guarded after the merge
    assert sk.last_epoch() == 1
    # reload sees the marker (it rides the committed generation)
    assert CMSketch.load(spark, str(tmp_path / "cme")).last_epoch() == 1
