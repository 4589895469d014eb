"""Skew-aware join utilities.

At 100 TB a handful of hot keys (one document with millions of fragments,
one degenerate shingle) can pin a join to a single reducer. Two remedies,
composable with everything else in this repo:

- AQE skew-join splitting is ON by default in session.py
  (`spark.sql.adaptive.skewJoin.enabled`) — handles sort-merge joins
  transparently at runtime.
- `salted_join` handles the case AQE can't: shuffle-hash/aggregation
  pipelines where one side must be exploded. The skewed (big) side gets a
  random salt in [0, S); the small side is replicated S× with every salt;
  the join key becomes (key, salt). Parallelism on the hot key improves S×
  at the cost of replicating the small side S×.

`top_keys` finds the keys worth salting (frequency skew report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Frequency skew report: heaviest keys with share of total."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
        .orderBy(F.desc("n_rows"), key)
        .limit(n)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Correctness: every big row joins the one replica of its key carrying the
    same salt, so the result multiset is identical to `big.join(small, key)`.
    """
    salted_big = big.withColumn(
        "__salt", (F.rand(seed) * salt_buckets).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    replicated_small = small.withColumn("__salt", salts)
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")
