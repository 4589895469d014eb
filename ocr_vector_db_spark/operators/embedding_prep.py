"""Corpus-level embedding preprocessing: per-dimension standardization.

Embedding corpora routinely arrive with anisotropic dimensions (a few
high-variance axes dominate cosine similarity — the "common direction"
pathology); standardizing each dimension against the corpus mean/std and
re-normalizing to unit length is the cheap whitening step that makes
cosine-based ANN/dedup behave (Mu & Viswanath, "All-but-the-Top", ICLR
2018 motivates the family; this is the diagonal version).

Scale shape (100 TB):
  * Stats are ONE posexplode + hash agg — dim rows out, decimal sums so
    the per-dimension mean/second-moment are exact and order-independent
    under any partitioning (the q82 discipline applied per dimension).
  * Applying is map-side only: the (mu, sd) vectors fold in as 2×dim
    literals (constant plan at any corpus size), the per-row math is
    zip_with/transform/aggregate — whole-stage codegen, no UDF, no
    second shuffle, no join.
  * Dimensions must be non-constant (sd > 0) — a constant dimension has
    no standardized direction; the sequential definition divides by zero
    there and so does this one. Validate upstream if in doubt.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def dim_stats(
    df: DataFrame, emb_col: str = "embedding"
) -> list[tuple[float, float]]:
    """[(mean, std)] per dimension, exact-decimal-summed (engine- and
    partitioning-independent); std = sqrt(E[v²] − mean²), population
    form, computed on IEEE doubles identical to the SQL twin's."""
    ex = df.select(
        F.posexplode(F.col(emb_col).cast("array<double>")).alias("i", "v")
    )
    rows = (
        ex.groupBy("i")
        .agg(
            (
                F.sum(F.round(F.col("v"), 9).cast("decimal(28,9)"))
                .cast("double") / F.count("*")
            ).alias("mu"),
            (
                F.sum(
                    F.round(F.col("v") * F.col("v"), 12)
                    .cast("decimal(38,12)")
                ).cast("double") / F.count("*")
            ).alias("m2"),
        )
        .orderBy("i")
        .collect()
    )
    # max(0, ·): the independently rounded sums can push m2 − mu² a few
    # ulps negative for a near-constant dimension — clamp instead of
    # crashing math.sqrt (sd == 0 then surfaces via the documented
    # non-constant-dimension contract, not a driver ValueError)
    return [(r.mu, math.sqrt(max(0.0, r.m2 - r.mu * r.mu))) for r in rows]


def validate_std_stats(stats: list[tuple[float, float]]) -> None:
    """Refuse a whitening profile with any constant dimension (sd == 0):
    the transform is undefined there — the distributed path would
    silently null-poison that dimension (Spark's x/0.0 on doubles is not
    NULL, but a 0.0/0.0 is NaN) while the driver twin raises
    ZeroDivisionError, so the two 'bit-matched' paths would diverge.
    Callers that persist a profile (IVFIndex/IVFPQIndex builds) validate
    at build time and fail loudly instead."""
    dead = [i for i, (_, sd) in enumerate(stats) if sd == 0.0]
    if dead:
        raise ValueError(
            f"standardize: dimensions {dead} are constant across the "
            "corpus (sd == 0) — whitening is undefined there; drop or "
            "jitter those dimensions before building a standardized index."
        )


def with_standardized(
    df: DataFrame,
    src_col: str,
    dst_col: str,
    stats: list[tuple[float, float]],
) -> DataFrame:
    """`df` + `dst_col` = the standardize-and-renormalize transform of
    `src_col` — the ONE df-level definition every consumer shares (the
    q120 operator below and `ann_index.IVFIndex(standardize=True)`'s
    layout/add/screen paths), so they evaluate the IDENTICAL IEEE ops:
    left-fold sum of squares, sqrt, zero-norm → 1.0 guard, per-element
    divide, ROUND HALF_UP to 6 dp.

    The z-scored array materializes ONCE through a temp column:
    higher-order functions are interpreted (no whole-stage-codegen
    common-subexpression elimination), so a single Column expression
    referencing z twice — once under the norm fold, once under the
    output transform — would compute the zip_with chain twice per row
    (measured ~30% on the q120 bench).

    The norm, in turn, must NEVER be referenced from inside a
    per-element lambda (optimization r15): CollapseProject inlines a
    textually-single-use column into its reference site, and a lambda
    body re-evaluates per ELEMENT — the previous
    ``transform(z, x / nrm_col)`` form re-ran the 64-op sum-of-squares
    fold (plus sqrt and the zero guard) once per element per row after
    collapsing (~8k interpreted ops/row; measured 3.4× on the q120
    apply pass). Now the sum of squares is a temp column referenced
    TWICE (non-cheap + multi-use, so CollapseProject keeps the
    projection boundary) and the divisor enters the element math as a
    ``zip_with`` against ``array_repeat(divisor, dim)`` — generator
    arguments evaluate once per ROW. Same IEEE ops in the same order:
    left-fold sum of squares, sqrt, zero-norm → 1.0 guard (ss == 0 iff
    sqrt(ss) == 0 on non-negative doubles), per-element divide, ROUND
    HALF_UP to 6 dp."""
    mu = F.array(*[F.lit(m) for m, _ in stats])
    sd = F.array(*[F.lit(s) for _, s in stats])
    v = F.col(src_col).cast("array<double>")
    z = F.zip_with(F.zip_with(v, mu, lambda a, b: a - b), sd,
                   lambda a, b: a / b)
    ztmp, stmp = "__std_z", "__std_ss"
    clash = {ztmp, stmp} & set(df.columns)
    if clash:
        raise ValueError(
            f"with_standardized: input columns {sorted(clash)} collide "
            "with internal helper names; rename them first."
        )
    ss = F.aggregate(F.col(ztmp), F.lit(0.0), lambda acc, x: acc + x * x)
    # zero-norm guard (assign_nearest_centroid's `or 1.0` discipline): a
    # row equal to the corpus mean standardizes to the zero vector —
    # emit it as zeros, not a silent all-null array from x/0
    divisor = F.when(F.col(stmp) != 0.0, F.sqrt(F.col(stmp))).otherwise(
        F.lit(1.0)
    )
    return (
        df.withColumn(ztmp, z)
        .withColumn(stmp, ss)
        .withColumn(
            dst_col,
            F.zip_with(
                F.col(ztmp),
                F.array_repeat(divisor, len(stats)),
                lambda x, n: F.round(x / n, 6),
            ),
        )
        .drop(ztmp, stmp)
    )


def standardize_vec(v: list[float], stats: list[tuple[float, float]]) -> list[float]:
    """Driver-side twin of `with_standardized` for a single query vector —
    the same IEEE ops in the same order (left-fold norm, HALF_UP round
    via the double's shortest decimal repr, exactly Spark's
    BigDecimal.valueOf path), so standardizing a corpus member here
    bit-matches its stored layout row."""
    from decimal import ROUND_HALF_UP, Decimal

    z = [(float(x) - m) / s for x, (m, s) in zip(v, stats)]
    acc = 0.0
    for x in z:
        acc = acc + x * x
    nrm = math.sqrt(acc) or 1.0
    six = Decimal("0.000001")
    return [
        float(Decimal(repr(x / nrm)).quantize(six, rounding=ROUND_HALF_UP))
        for x in z
    ]


def standardize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    stats: list[tuple[float, float]] | None = None,
) -> DataFrame:
    """(id_col, unit_std): each embedding standardized per dimension
    against the corpus stats ((v − mu)/sd), then re-normalized to unit
    L2 and rounded to 6 dp — ready for cosine ANN/dedup. Pass `stats`
    to reuse a precomputed (or training-corpus) profile; by default the
    profile is fit on `df` itself (one agg, dim rows)."""
    from ocr_vector_db_spark.session import spread_for_compute

    stats = stats if stats is not None else dim_stats(df, emb_col)
    # The apply pass is interpreted higher-order-function math (~4·dim
    # element ops per row, no codegen) — by far the most expensive
    # map-only stage in this module. Floor its parallelism: a
    # single-row-group input otherwise runs the whole corpus transform
    # on ONE core (no-op on any already-parallel input; guide §2).
    src = spread_for_compute(df.select(id_col, emb_col))
    return with_standardized(
        src, emb_col, "unit_std", stats
    ).select(id_col, "unit_std")
