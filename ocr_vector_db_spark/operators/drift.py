"""Distribution-drift monitoring — PSI between two corpus slices.

The Population Stability Index is the standard release gate for "did
this epoch's data shift?" (Karakoulas 2004; the credit-scoring PSI
carried into ML data pipelines): histogram both slices on shared bins,
PSI = Σ (p_a − p_b)·ln(p_a / p_b). PSI < 0.1 stable, 0.1–0.25 drifting,
> 0.25 shifted.

Engine-portable by construction (the repo's oracle discipline):

  * Binning is ALL-INTEGER: bin = (v − min)·B div (max − min + 1) on
    bigints — no float widths, no boundary rounding, identical on any
    engine. min/max come from the UNION of both slices, so the bins are
    shared by definition.
  * Laplace smoothing (+0.5 per bin) keeps empty bins finite without an
    arbitrary epsilon clamp: p = (cnt + 0.5)/(N + B/2), the same
    rational on both engines.
  * Per-bin terms round to 9 dp, sum exactly as DECIMAL, final PSI
    rounds to 6 dp — the established float-sum ordering discipline.

Scale shape: one pass for min/max (1-row broadcast), one
map-side-combinable (slice, bin) count agg, and the PSI fold runs on
the B-row histogram. The corpus shuffles once, on the bin key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def int_bin(v: Column, vmin: Column, vmax: Column, bins: int) -> Column:
    """All-integer shared binning: (v−min)·B div (max−min+1) ∈ [0, B)."""
    return F.call_function(
        "div",
        (v.cast("bigint") - vmin) * F.lit(bins),
        vmax - vmin + F.lit(1),
    ).cast("int")


def psi_report(
    df: DataFrame,
    slice_col: Column,
    value_col: str,
    bins: int = 10,
) -> DataFrame:
    """One row — (n_a, n_b, n_bins, psi) — for the drift of ``value_col``
    between the two slices ``slice_col`` (boolean: true = slice A).
    Rows with NULL values are excluded (no bin is 'missing')."""
    base = df.filter(F.col(value_col).isNotNull()).select(
        slice_col.alias("_a"), F.col(value_col).cast("bigint").alias("_v")
    )
    ext = base.agg(
        F.min("_v").alias("_mn"), F.max("_v").alias("_mx")
    )
    binned = base.join(F.broadcast(ext)).select(
        "_a", int_bin(F.col("_v"), F.col("_mn"), F.col("_mx"), bins)
        .alias("_bin")
    )
    hist = (
        binned.groupBy("_bin")
        .agg(
            F.sum(F.when(F.col("_a"), 1).otherwise(0)).alias("_ca"),
            F.sum(F.when(F.col("_a"), 0).otherwise(1)).alias("_cb"),
        )
    )
    # fold on the <=B-row histogram: totals broadcast back, smoothed
    # probabilities, exact decimal sum of 9-dp-rounded terms
    tot = hist.agg(
        F.sum("_ca").cast("bigint").alias("_na"),
        F.sum("_cb").cast("bigint").alias("_nb"),
    )
    half_b = bins / 2.0
    pa = (F.col("_ca") + F.lit(0.5)) / (F.col("_na") + F.lit(half_b))
    pb = (F.col("_cb") + F.lit(0.5)) / (F.col("_nb") + F.lit(half_b))
    term = F.round((pa - pb) * F.log(pa / pb), 9)
    return (
        hist.join(F.broadcast(tot))
        .agg(
            F.max("_na").alias("n_a"),
            F.max("_nb").alias("n_b"),
            F.lit(bins).cast("int").alias("n_bins"),
            F.round(
                F.sum(term.cast("decimal(28,9)")).cast("double"), 6
            ).alias("psi"),
        )
    )
