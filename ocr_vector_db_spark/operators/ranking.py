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
from pyspark.sql import types as T

# Cap on the cutpoint count: _bucket_id builds one comparison term per
# cutpoint, so the expression tree grows O(B).  1024 terms is well inside
# Catalyst's comfort zone while still giving every core of a large cluster
# multiple buckets to sort (the per-bucket local sort parallelism comes from
# the hash shuffle, which still uses spark.sql.shuffle.partitions tasks —
# several small buckets per task is fine).  See SCALING.md.
MAX_RANGE_BUCKETS = 1024


def _key_as_double(key: str, dtype: T.DataType) -> Column:
    """Monotone double image of the leading sort key, used ONLY for bucket
    assignment (the per-bucket window still sorts the native column).
    Correctness needs the mapping to be order-preserving (non-strictly):
    distinct values that collide in double simply share a bucket and are
    tie-broken by the native sort.  That holds for numerics (including
    bigint/decimal beyond 2^53 — the cast is non-decreasing) and for
    date/timestamp via epoch conversion.  It does NOT hold for strings
    (lexical '10' < '9' but 10.0 > 9.0), so those are rejected upstream."""
    if isinstance(dtype, T.DateType):
        # days since epoch: exact and monotone (timestamp-cast would be
        # timezone-dependent; datediff is not)
        return F.datediff(F.col(key), F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return F.col(key).cast("double")  # epoch seconds, monotone
    return F.col(key).cast("double")


def _check_leading_key(df: DataFrame, key: str) -> T.DataType:
    """The bucketing requires a leading key whose double image orders like
    the native type (see _key_as_double).  Reject everything else loudly
    rather than silently producing wrong global ranks."""
    dtype = df.schema[key].dataType
    ok = isinstance(
        dtype,
        (T.NumericType, T.BooleanType, T.DateType, T.TimestampType,
         T.TimestampNTZType),
    )
    if not ok:
        raise TypeError(
            f"global_row_number/exact_ntile: leading sort key {key!r} has "
            f"type {dtype.simpleString()}; only numeric, boolean, date and "
            "timestamp keys are supported (a string key's lexical order "
            "differs from its double-cast order, which would corrupt the "
            "range bucketing). Order by a numeric surrogate instead."
        )
    return dtype


def _bucket_cutpoints(
    df: DataFrame, key: str, dtype: T.DataType, n_buckets: int
) -> list[float]:
    """B-1 approx-percentile cutpoints of ``key`` as driver-side floats.
    Deduplicated (heavy ties produce repeated quantiles) and safe on an
    all-null / empty relation (returns [])."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.percentile_approx(
            _key_as_double(key, dtype), F.array(*[F.lit(p) for p in probs]),
            F.lit(10_000),
        ).alias("c")
    ).head()
    cuts = row["c"] if row is not None else None
    return sorted({float(c) for c in (cuts or []) if c is not None})


def _bucket_id(key: str, dtype: T.DataType, cuts: list[float]) -> Column:
    """#cutpoints <= key, null keys → 0 (nulls sort first, matching the
    window's ASC NULLS FIRST). Pure per-row expression — every plan branch
    computes the identical partitioning.  A plain comparison-sum chain, not
    an array-HOF: lambda expressions inside a join key trip Catalyst's
    constraint inference when the inferred isnotnull filter lands above the
    counts aggregate (the lambda's captured attribute no longer resolves).
    The sum is O(#cutpoints) expression terms — bounded by
    MAX_RANGE_BUCKETS, independent of the cluster's shuffle-partition
    setting — and is reduced as a BALANCED binary tree: a left-leaning
    ``((a+b)+c)+...`` chain of ~1000 terms overflows the JVM stack during
    Catalyst's recursive analysis (measured: StackOverflowError at 1023
    terms), while the balanced tree is depth log2(B)."""
    if not cuts:
        return F.lit(0)
    val = _key_as_double(key, dtype)
    terms = [(val >= F.lit(c)).cast("int") for c in cuts]
    while len(terms) > 1:
        terms = [
            terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return F.when(val.isNull(), F.lit(0)).otherwise(terms[0])


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
    bucket count (default: spark.sql.shuffle.partitions, clamped to
    MAX_RANGE_BUCKETS so a many-thousand-partition cluster config cannot
    balloon the O(B) bucket-id expression chain).

    The leading key must be numeric/boolean/date/timestamp (validated;
    strings raise TypeError — see _key_as_double for why)."""
    from ocr_vector_db_spark.operators.retrieval import bounded_window

    spark = df.sparkSession
    dtype = _check_leading_key(df, keys[0])
    helpers = {"_bid", "_lrn", "_ofs", "_tot"}
    clash = helpers & set(df.columns)
    if clash:
        raise ValueError(
            f"global_row_number: input columns {sorted(clash)} collide with "
            "internal helper names; rename them first."
        )
    n_buckets = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n_buckets = min(n_buckets, MAX_RANGE_BUCKETS)
    cuts = _bucket_cutpoints(df, keys[0], dtype, n_buckets)
    local = df.withColumn("_bid", _bucket_id(keys[0], dtype, cuts))
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


def _ceil_div(a: Column, b: Column) -> Column:
    """Exact bigint ceil(a/b) for positive a, b via SQL integer division —
    no double rounding, so exactness holds for any bigint count (the naive
    ``F.ceil(a / b)`` routes through double and only holds below ~2^52)."""
    return F.call_function("div", a + b - F.lit(1), b)


def ntile_from_rank(rn: Column, total: Column, n_buckets: int) -> Column:
    """Closed-form SQL ``ntile(n_buckets)`` from a 1-based global rank and
    the total row count: the first ``total % n`` buckets hold
    ``ceil(total/n)`` rows, the rest ``floor(total/n)`` — identical to the
    windowed ntile on every engine.  All-integer arithmetic (bigint div),
    exact for any count."""
    q = F.call_function("div", total.cast("bigint"), F.lit(n_buckets))
    r = (total % n_buckets).cast("bigint")
    big = r * (q + 1)  # rows living in the first r (larger) buckets
    in_big = _ceil_div(rn.cast("bigint"), q + 1).cast("int")
    # guard q=0 (fewer rows than buckets): everything lands in the big tier
    in_small = (
        r + _ceil_div(rn.cast("bigint") - big, F.greatest(q, F.lit(1)))
    ).cast("int")
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
    clash = {"_grn", "_gtot"} & set(df.columns)
    if clash:
        raise ValueError(
            f"exact_ntile: input columns {sorted(clash)} collide with "
            "internal helper names; rename them first."
        )
    ranked = global_row_number(
        df, keys, out_col="_grn", total_col="_gtot",
        num_partitions=num_partitions,
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(F.col("_grn"), F.col("_gtot"), n_buckets)
    ).drop("_grn", "_gtot")


def global_prefix_sums(
    df: DataFrame,
    key: str,
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running SUM(col) OVER (ORDER BY key) for each of ``sum_cols``
    — `global_row_number`'s machinery generalized from counting rows to
    summing columns, with the same shape: cutpoint-bucket the key (one
    hash shuffle, never a global sort), per-bucket window cumsums, and a
    broadcast prefix-sum of the ≤B-row bucket totals. Output columns are
    ``cum_<name>`` (bigint). ``key`` must be a total order within the
    rows (callers aggregate to distinct keys first — running an ECDF
    over a value histogram is the intended use) and carries
    `global_row_number`'s type restriction."""
    from ocr_vector_db_spark.operators.retrieval import bounded_window

    spark = df.sparkSession
    dtype = _check_leading_key(df, key)
    helpers = {"_bid"} | {
        f"{p}{c}" for c in sum_cols for p in ("_l", "_t", "_o", "cum_")
    }
    clash = helpers & set(df.columns)
    if clash:
        raise ValueError(
            f"global_prefix_sums: input columns {sorted(clash)} collide "
            "with internal helper names; rename them first."
        )
    n_buckets = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    n_buckets = min(n_buckets, MAX_RANGE_BUCKETS)
    cuts = _bucket_cutpoints(df, key, dtype, n_buckets)
    local = df.withColumn("_bid", _bucket_id(key, dtype, cuts))
    w_local = (
        Window.partitionBy("_bid").orderBy(F.col(key))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in sum_cols:
        local = local.withColumn(
            f"_l{c}", F.sum(F.col(c)).over(w_local).cast("bigint")
        )
    totals = local.groupBy("_bid").agg(
        *[F.sum(c).cast("bigint").alias(f"_t{c}") for c in sum_cols]
    )
    w_prev = bounded_window(F.col("_bid"), F.col("_bid")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_bid",
        *[
            F.coalesce(F.sum(f"_t{c}").over(w_prev), F.lit(0))
            .cast("bigint").alias(f"_o{c}")
            for c in sum_cols
        ],
    )
    out = local.join(F.broadcast(offsets), "_bid")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", (F.col(f"_l{c}") + F.col(f"_o{c}")).cast("bigint")
        )
    drop = ["_bid"] + [f"_l{c}" for c in sum_cols] \
        + [f"_o{c}" for c in sum_cols]
    return out.drop(*drop)
