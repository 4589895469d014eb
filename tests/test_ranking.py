"""operators/ranking.py — distributed exact global rank / ntile.

Parity oracle: Spark's own windowed row_number/ntile (the single-partition
plan the operator replaces) on the same data, every edge: n < buckets,
n % buckets != 0, duplicate sort values (tie-broken by id), multi-partition
inputs, and the plan shape (no global sort, exchange reuse).
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.ranking import (
    exact_ntile,
    global_row_number,
    ntile_from_rank,
)


def _windowed(df, keys, n):
    w = Window.orderBy(*keys)
    return df.withColumn("bucket", F.ntile(n).over(w))


@pytest.mark.parametrize("n_rows,n_buckets", [(7, 10), (10, 10), (103, 10),
                                              (1000, 7), (1, 3)])
def test_exact_ntile_matches_window(spark, n_rows, n_buckets):
    df = (
        spark.range(n_rows)
        .withColumn("val", (F.col("id") * 37 % 11).cast("double"))  # heavy ties
        .repartition(5)
    )
    keys = ["val", "id"]
    got = {
        (r.id, r.bucket)
        for r in exact_ntile(df, keys, n_buckets, num_partitions=4).collect()
    }
    want = {(r.id, r.bucket) for r in _windowed(df, keys, n_buckets).collect()}
    assert got == want


def test_global_row_number_matches_window(spark):
    df = spark.range(257).withColumn("val", (F.col("id") % 13).cast("double"))
    got = {
        (r.id, r.rn, r.tot)
        for r in global_row_number(
            df, ["val", "id"], out_col="rn", total_col="tot",
            num_partitions=6,
        ).collect()
    }
    w = Window.orderBy("val", "id")
    want = {
        (r.id, r.rn, 257)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_ntile_from_rank_closed_form(spark):
    # exhaustive vs Python reference for every (n, buckets) pair in range
    rows = []
    for n in range(1, 40):
        for b in (3, 10):
            q, r = divmod(n, b)
            for rn in range(1, n + 1):
                if q == 0 or rn <= r * (q + 1):
                    want = -(-rn // (q + 1))
                else:
                    want = r + -(-(rn - r * (q + 1)) // q)
                rows.append((n, b, rn, want))
    df = spark.createDataFrame(rows, "n bigint, b int, rn bigint, want int")
    bad = (
        df.withColumn(
            "got",
            F.when(F.col("b") == 3,
                   ntile_from_rank(F.col("rn"), F.col("n"), 3))
            .otherwise(ntile_from_rank(F.col("rn"), F.col("n"), 10)),
        )
        .filter(F.col("got") != F.col("want"))
        .count()
    )
    assert bad == 0


def test_ranking_plan_no_global_sort(spark):
    import re

    df = spark.range(100).withColumn("val", F.col("id").cast("double"))
    plan = (
        exact_ntile(df, ["val", "id"], 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert not re.search(r"Sort \[[^\]]*\], true", plan)
    assert plan.count("hashpartitioning(_bid") >= 1
    # the only SinglePartition exchange is the bounded (<= n_buckets rows)
    # offsets prefix-sum, living inside the broadcast subtree
    assert plan.count("Exchange SinglePartition") <= 1
    if "Exchange SinglePartition" in plan:
        assert plan.index("Exchange SinglePartition") > plan.index(
            "BroadcastExchange"
        )


def test_ranking_all_equal_keys_degenerate(spark):
    # pathological: every leading key identical → one bucket, still exact
    df = spark.range(25).withColumn("val", F.lit(1.0))
    got = {(r.id, r.bucket)
           for r in exact_ntile(df, ["val", "id"], 4).collect()}
    want = {(r.id, r.bucket)
            for r in _windowed(df, ["val", "id"], 4).collect()}
    assert got == want


def test_ranking_null_keys_sort_first(spark):
    df = spark.range(40).withColumn(
        "val",
        F.when(F.col("id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise((F.col("id") % 5).cast("double")),
    )
    got = {(r.id, r.bucket)
           for r in exact_ntile(df, ["val", "id"], 10).collect()}
    want = {(r.id, r.bucket)
            for r in _windowed(df, ["val", "id"], 10).collect()}
    assert got == want

def test_ranking_string_key_rejected(spark):
    # a string leading key's lexical order differs from its double-cast
    # order ('10' < '9' lexically) — must raise, not silently mis-rank
    df = spark.range(20).withColumn("val", F.col("id").cast("string"))
    with pytest.raises(TypeError, match="leading sort key"):
        exact_ntile(df, ["val", "id"], 4)
    with pytest.raises(TypeError, match="leading sort key"):
        global_row_number(df, ["val", "id"])


def test_ranking_date_key_supported(spark):
    df = spark.range(60).withColumn(
        "d", F.date_add(F.lit("2020-01-01"), (F.col("id") * 13 % 40).cast("int"))
    )
    got = {(r.id, r.bucket)
           for r in exact_ntile(df, ["d", "id"], 5, num_partitions=4).collect()}
    want = {(r.id, r.bucket) for r in _windowed(df, ["d", "id"], 5).collect()}
    assert got == want


def test_ranking_timestamp_key_supported(spark):
    df = spark.range(60).withColumn(
        "ts", F.timestamp_seconds(1_500_000_000 + F.col("id") * 977 % 50)
    )
    got = {(r.id, r.bucket)
           for r in exact_ntile(df, ["ts", "id"], 5, num_partitions=4).collect()}
    want = {(r.id, r.bucket) for r in _windowed(df, ["ts", "id"], 5).collect()}
    assert got == want


def test_ranking_helper_name_collision_rejected(spark):
    df = spark.range(10).withColumn("_bid", F.col("id") * 2)
    with pytest.raises(ValueError, match="_bid"):
        global_row_number(df, ["id"])
    df2 = spark.range(10).withColumn("_grn", F.col("id") * 2)
    with pytest.raises(ValueError, match="_grn"):
        exact_ntile(df2, ["id"], 4)


def test_ranking_bucket_count_clamped(spark):
    # a cluster-sized shuffle-partition config must not balloon the O(B)
    # cutpoint comparison chain past MAX_RANGE_BUCKETS terms
    from ocr_vector_db_spark.operators.ranking import MAX_RANGE_BUCKETS

    df = spark.range(5000).withColumn("val", F.col("id").cast("double"))
    out = global_row_number(df, ["val", "id"], num_partitions=100_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # percentile_approx dedupes ties, so each of the two _bid branches
    # (rank + counts) carries <= B-1 comparison terms
    assert plan.count(">= ") <= 2 * MAX_RANGE_BUCKETS
    # and the answer is still exact
    got = {(r.id, r.rn) for r in out.collect()}
    w = Window.orderBy("val", "id")
    want = {(r.id, r.rn)
            for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == want


def test_ntile_from_rank_exact_beyond_double_precision(spark):
    # counts beyond 2^52: double-routed ceil would round; bigint div must not
    big = 2**60
    df = spark.createDataFrame(
        [(big, big), (big - 1, big), (1, big), (big // 2, big)],
        "rn bigint, tot bigint",
    )
    rows = {
        (r.rn, r.got)
        for r in df.withColumn(
            "got", ntile_from_rank(F.col("rn"), F.col("tot"), 10)
        ).collect()
    }
    q, rem = divmod(big, 10)  # rem == 6 for 2^60

    def ref(rn):
        if rn <= rem * (q + 1):
            return -(-rn // (q + 1))
        return rem + -(-(rn - rem * (q + 1)) // q)

    assert rows == {(rn, ref(rn)) for rn in (big, big - 1, 1, big // 2)}


def test_global_prefix_sums_matches_window_oracle(spark):
    from pyspark.sql import Window

    from ocr_vector_db_spark.operators.ranking import global_prefix_sums

    import random

    random.seed(3)
    rows = [(v, random.randint(0, 9), random.randint(0, 9))
            for v in random.sample(range(10_000), 500)]
    df = spark.createDataFrame(rows, "v bigint, x bigint, y bigint")
    got = {
        r.v: (r.cum_x, r.cum_y)
        for r in global_prefix_sums(df, "v", ["x", "y"],
                                    num_partitions=16).collect()
    }
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.v: (r.cx, r.cy)
        for r in df.select(
            "v",
            F.sum("x").over(w).alias("cx"),
            F.sum("y").over(w).alias("cy"),
        ).collect()
    }
    assert got == want


def test_ks_report_hand_computed(spark):
    from ocr_vector_db_spark.operators.drift import ks_report

    # A = {1,2,3,4}, B = {3,4,5,6}: ECDF gap peaks at v=2 → |2/4 - 0/4|=0.5
    rows = [(True, v) for v in (1, 2, 3, 4)] + \
           [(False, v) for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "a boolean, v bigint")
    r = ks_report(df, F.col("a"), "v").head()
    assert (r.n_a, r.n_b, r.n_values, r.ks) == (4, 4, 6, 0.5)

    # identical slices → ks exactly 0
    same = [(s, v) for s in (True, False) for v in (7, 8, 9, 9)]
    z = ks_report(
        spark.createDataFrame(same, "a boolean, v bigint"), F.col("a"), "v"
    ).head()
    assert z.ks == 0.0

    # disjoint supports → ks exactly 1
    dis = [(True, v) for v in (1, 2)] + [(False, v) for v in (10, 11)]
    o = ks_report(
        spark.createDataFrame(dis, "a boolean, v bigint"), F.col("a"), "v"
    ).head()
    assert o.ks == 1.0


def test_bounded_window_partition_spec_survives_optimizer(spark):
    """Version guard for `retrieval.bounded_window` (VERDICT r10 #6): the
    non-foldable partition constant `pmod(xxhash64(anchor), 1)` must
    SURVIVE Catalyst's constant folding / arithmetic simplification — if a
    future Spark learns to fold it, the partition spec is eliminated and
    this fails loudly (semantics stay correct; this helper is then the one
    place to re-derive a fold-resistant constant)."""
    from pyspark.sql import functions as F

    from ocr_vector_db_spark.operators.retrieval import bounded_window

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(5)], "id bigint, score double"
    ).orderBy(F.desc("score")).limit(5)
    ranked = df.withColumn(
        "rank",
        F.row_number().over(
            bounded_window(F.col("score"), F.desc("score"), F.col("id"))
        ),
    )
    plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    window_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert window_lines, plan
    # the Window keeps a non-empty partition spec (analysis extracts the
    # expression into a projected _w column; an algebraic pmod(x,1)→0
    # rewrite would constant-fold that projection away and empty the spec)
    assert any("], [_w" in ln for ln in window_lines), plan
    assert "pmod(xxhash64(" in plan, plan
    # and the semantics hold: rank follows the score order
    assert [r.id for r in ranked.orderBy("rank").collect()] == [0, 1, 2, 3, 4]
