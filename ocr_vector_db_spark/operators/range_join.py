"""Binned (bucketed) range join — inequality time-joins as equi-joins.

A naive range join (`l.ts - 10min <= r.ts < l.ts`) has no equality
predicate, so Spark plans it as a broadcast-nested-loop / cartesian join —
O(|L|·|R|) comparisons, catastrophic at 100 TB. The standard fix (used by
Databricks' range-join optimization and KDB-style time joins) is to
bucketize time into fixed bins: every row gets `bin = floor(epoch / width)`,
the left side additionally enumerates each candidate bin its window
overlaps, and the join becomes an EQUI-join on (keys…, bin) followed by the
exact range filter. With `width >= window length` each left row lands in at
most 2 bins, so the join multiplies the left side by ≤2 — and Catalyst
executes it as a plain shuffled hash / sort-merge join that partitions,
prunes, and scales like any other equi-join.

Reference tie-in: the reference has no time-range operator (its `events`
analytics live in this repo's extension surface, SURVEY §2.13); this is the
batch twin of Structured Streaming's interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    lower_s: float,
    upper_s: float,
    left_ts: str = "ts",
    right_ts: str = "ts",
    bin_width_s: float | None = None,
) -> DataFrame:
    """Inner-join rows where `right.right_ts - left.left_ts ∈ [lower_s,
    upper_s)` and all `keys` match. Columns from both sides are kept (the
    right timestamp under `__r_<right_ts>` when names collide).

    `bin_width_s` defaults to the window length (≤2 candidate bins per left
    row). A (left,right) pair can never duplicate: a right row lives in
    exactly one bin. Non-key right columns that collide with left column
    names must be renamed by the caller first (the right timestamp is
    auto-renamed to `__r_<name>` when it collides)."""
    # exact integer microsecond arithmetic — no float boundary effects
    width_us = int(round(float(bin_width_s or (upper_s - lower_s)) * 1_000_000))
    lower_us = int(round(lower_s * 1_000_000))
    upper_us = int(round(upper_s * 1_000_000))
    if width_us <= 0:
        raise ValueError("window must be non-empty")

    lus = F.unix_micros(F.col(left_ts))
    lft = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor((lus + F.lit(lower_us)) / F.lit(width_us)),
                F.floor((lus + F.lit(upper_us)) / F.lit(width_us)),
            )
        ),
    ).alias("__l")

    r_ts_col = f"__r_{right_ts}" if right_ts == left_ts else right_ts
    rgt = right.withColumnRenamed(right_ts, r_ts_col) if r_ts_col != right_ts else right
    rgt = rgt.withColumn(
        "__bin", F.floor(F.unix_micros(F.col(r_ts_col)) / F.lit(width_us))
    ).alias("__r")

    cond = [F.col(f"__l.{k}") == F.col(f"__r.{k}") for k in keys]
    cond.append(F.col("__l.__bin") == F.col("__r.__bin"))
    keep_right = [c for c in rgt.columns if c not in set(keys) | {"__bin"}]
    joined = lft.join(rgt, cond, "inner").select(
        "__l.*", *[F.col(f"__r.{c}") for c in keep_right]
    )
    delta = F.unix_micros(F.col(r_ts_col)) - F.unix_micros(F.col(left_ts))
    return (
        joined.filter((delta >= F.lit(lower_us)) & (delta < F.lit(upper_us)))
        .drop("__bin")
    )
