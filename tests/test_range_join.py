"""Binned range join: equivalence to the naive inequality join."""

import datetime as dt
import random

from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.range_join import range_join_binned


def _events(spark, n=300, seed=7):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + dt.timedelta(seconds=rng.uniform(0, 3600), microseconds=rng.randint(0, 999999)),
            rng.randint(0, 5),
            rng.choice(["a", "b"]),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id", "kind"])


def test_range_join_matches_naive(spark):
    e = _events(spark)
    left = e.filter(F.col("kind") == "a").select("event_id", "user_id", "ts")
    right = e.filter(F.col("kind") == "b").select(
        F.col("event_id").alias("r_id"), "user_id", "ts"
    )

    got = range_join_binned(left, right, ["user_id"], -120.0, 60.0)
    got_pairs = {(r.event_id, r.r_id) for r in got.collect()}

    l, r = left.alias("l"), right.alias("r")
    delta = F.unix_micros(F.col("r.ts")) - F.unix_micros(F.col("l.ts"))
    naive = l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (delta >= -120_000_000)
        & (delta < 60_000_000),
    )
    naive_pairs = {(x["event_id"], x["r_id"]) for x in naive.collect()}
    assert got_pairs == naive_pairs
    assert len(got_pairs) > 0


def test_range_join_no_duplicate_pairs(spark):
    e = _events(spark, n=200, seed=11)
    left = e.select("event_id", "user_id", "ts")
    right = e.select(F.col("event_id").alias("r_id"), "user_id", "ts")
    out = range_join_binned(left, right, ["user_id"], -300.0, 300.0)
    n = out.count()
    assert out.select("event_id", "r_id").distinct().count() == n


def test_range_join_is_equi_join_plan(spark):
    e = _events(spark, n=50)
    left = e.select("event_id", "user_id", "ts")
    right = e.select(F.col("event_id").alias("r_id"), "user_id", "ts")
    plan = range_join_binned(left, right, ["user_id"], -60.0, 0.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
