"""Deterministic weighted sampling for training-mix construction.

`weighted_sample` is Efraimidis & Spirakis (2006) A-ES reservoir sampling
expressed as a top-k: each row draws key_i = ln(u_i) / w_i (the log of
u_i^(1/w_i), same ordering) with u_i a salted-md5-derived uniform, and the
k largest keys ARE a weighted sample without replacement — inclusion
probability tracks w_i exactly as the sequential reservoir algorithm.

Why this shape at 100 TB:
  * Draws are pure functions of the row key (md5-uniform, no seeded RNG) —
    the repo-wide split/keep discipline (q57/q91): the sample is stable
    across engines, re-runs, repartitions, and incremental appends.
  * The "reservoir" never exists as state: selection is one
    TakeOrderedAndProject over the scored scan (per-partition heaps + one
    k-row merge on the driver), no shuffle of the corpus, no sequential
    pass. Streaming twin: keep a per-batch top-k and fold — keys are
    comparable across batches by construction.
  * ln/division on engine-identical doubles (conv(md5) is the established
    portable hex path — operators/packing.py:42); ranking uses the
    UNROUNDED key, the emitted column rounds to 6 dp.

Rows with weight <= 0 are excluded (u^(1/w) is undefined there), matching
the sequential algorithm's domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_U52 = float(1 << 52)  # 13 hex digits -> [0, 2^52); +0.5 keeps u in (0,1)


def es_key_col(id_col: Column, weight: Column, salt: str = "es") -> Column:
    """ln(u)/w — the A-ES sort key (descending = weighted sample)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "#"), id_col.cast("string"))), 1, 13
        ),
        16, 10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(_U52)
    return F.log(u) / weight.cast("double")


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "es",
) -> DataFrame:
    """(id_col, weight, es_key): k rows sampled WITHOUT replacement with
    probability proportional to `weight_col`, deterministically — the
    same k rows on every run/engine/partitioning. Ties on the key break
    by id; es_key is emitted rounded to 6 dp for cross-engine compare."""
    key = es_key_col(F.col(id_col), F.col(weight_col), salt)
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            id_col,
            F.col(weight_col).alias("weight"),
            key.alias("__k"),
        )
        .orderBy(F.desc("__k"), id_col)
        .limit(k)
        .select(id_col, "weight", F.round("__k", 6).alias("es_key"))
    )
