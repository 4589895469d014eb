"""Distributed exact global ranking — the scale-safe replacement for
``Window.orderBy(...)`` over an unbounded relation.

A global window (``row_number``/``ntile`` with no PARTITION BY) forces
``Exchange SinglePartition``: the whole relation funnels through one task.
This module computes the SAME exact answers with the cutpoint pattern the
q61 docstring promised:

1. one lightweight pass computes ``B-1`` approx-percentile cutpoints of the
   leading sort key and collects them to the driver (B doubles — bounded by
   the requested bucket count, not data size), embedding them as plan
   LITERALS;
2. every row gets a bucket id = #cutpoints <= key — a pure function of the
   row's data, so every branch of the main plan derives the identical
   partitioning with no reliance on exchange reuse or sampling determinism
   (a ``repartitionByRange`` TeraSort variant is 1 shuffle cheaper but its
   correctness hinges on AQE reusing the range exchange between the counts
   branch and the rank branch: Spark's RangePartitioner seeds boundary
   sampling by RDD id, so un-reused recomputation can silently skew ranks —
   rejected);
3. local rank within bucket via ``Window.partitionBy(bucket)`` — ONE
   hash-partition shuffle of the relation, per-bucket sorts, never a global
   sort;
4. per-bucket counts (map-side partial agg → <=B rows) prefix-summed into
   offsets and broadcast-joined back: ``global_rank = local + offset``.

Ranks are EXACT regardless of cutpoint quality — the cutpoints only balance
the buckets (ties collapse into one bucket; a pathological all-equal key
degenerates to a single sorted partition, as any range partitioning must).

Reference parity: the reference ranks quality deciles with a single-node
``ntile`` (SURVEY.md §2.5); this is the distributed twin, identical output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_cutpoints(df: DataFrame, key: str, n_buckets: int) -> list[float]:
    """B-1 approx-percentile cutpoints of ``key`` as driver-side floats.
    Deduplicated (heavy ties produce repeated quantiles) and safe on an
    all-null / empty relation (returns [])."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.percentile_approx(
            F.col(key).cast("double"), F.array(*[F.lit(p) for p in probs]),
            F.lit(10_000),
        ).alias("c")
    ).head()
    cuts = row["c"] if row is not None else None
    return sorted({float(c) for c in (cuts or []) if c is not None})


def _bucket_id(key: str, cuts: list[float]) -> Column:
    """#cutpoints <= key, null keys → 0 (nulls sort first, matching the
    window's ASC NULLS FIRST). Pure per-row expression — every plan branch
    computes the identical partitioning.  A plain comparison-sum chain, not
    an array-HOF: lambda expressions inside a join key trip Catalyst's
    constraint inference when the inferred isnotnull filter lands above the
    counts aggregate (the lambda's captured attribute no longer resolves)."""
    if not cuts:
        return F.lit(0)
    val = F.col(key).cast("double")
    bid: Column = F.lit(0)
    for c in cuts:
        bid = bid + (val >= F.lit(c)).cast("int")
    return F.when(val.isNull(), F.lit(0)).otherwise(bid)


def global_row_number(
    df: DataFrame,
    keys: list[str],
    out_col: str = "rn",
    total_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row_number over ``ORDER BY keys`` without a
    single-partition sort.  ``keys`` must be a deterministic total order
    (append a unique id as the last key); the leading key drives the range
    bucketing.  If ``total_col`` is given, the total row count is attached
    to every row (needed for ntile math).  ``num_partitions`` sets the
    bucket count (default: spark.sql.shuffle.partitions)."""
    from ocr_vector_db_spark.operators.retrieval import bounded_window

    spark = df.sparkSession
    n_buckets = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    cuts = _bucket_cutpoints(df, keys[0], n_buckets)
    local = df.withColumn("_bid", _bucket_id(keys[0], cuts))
    w_local = Window.partitionBy("_bid").orderBy(*[F.col(k) for k in keys])
    ranked = local.withColumn("_lrn", F.row_number().over(w_local).cast("bigint"))
    counts = local.groupBy("_bid").agg(F.count(F.lit(1)).alias("_cnt"))
    # counts is bounded by the bucket count (cluster size, not data size)
    w_base = bounded_window(F.col("_bid"), F.col("_bid"))
    w_prev = w_base.rowsBetween(Window.unboundedPreceding, -1)
    w_all = w_base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_bid",
        F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias("_ofs"),
        F.sum("_cnt").over(w_all).alias("_tot"),
    )
    out = (
        ranked.join(F.broadcast(offsets), "_bid")
        .withColumn(out_col, F.col("_lrn") + F.col("_ofs"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_tot"))
    return out.drop("_bid", "_lrn", "_ofs", "_tot")


def ntile_from_rank(rn: Column, total: Column, n_buckets: int) -> Column:
    """Closed-form SQL ``ntile(n_buckets)`` from a 1-based global rank and
    the total row count: the first ``total % n`` buckets hold
    ``ceil(total/n)`` rows, the rest ``floor(total/n)`` — identical to the
    windowed ntile on every engine."""
    q = F.floor(total / n_buckets).cast("bigint")
    r = (total % n_buckets).cast("bigint")
    big = r * (q + 1)  # rows living in the first r (larger) buckets
    in_big = F.ceil(rn / (q + 1)).cast("int")
    # guard q=0 (fewer rows than buckets): everything lands in the big tier
    in_small = (r + F.ceil((rn - big) / F.greatest(q, F.lit(1)))).cast("int")
    return F.when(rn <= big, in_big).otherwise(in_small)


def exact_ntile(
    df: DataFrame,
    keys: list[str],
    n_buckets: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact distributed ``ntile(n_buckets) OVER (ORDER BY keys)`` — same
    output as the global window, one hash shuffle instead of one task."""
    ranked = global_row_number(
        df, keys, out_col="_grn", total_col="_gtot",
        num_partitions=num_partitions,
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("_grn"), F.col("_gtot"), n_buckets)
    ).drop("_grn", "_gtot")
