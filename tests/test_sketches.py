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
