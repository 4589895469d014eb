"""Shared registry + engine-portability helpers for the query families
(split from the former monolithic inventory.py — see plans/inventory.py,
the driver-facing hub).

Every operator from SURVEY.md §2 registers here as a (spark query,
duckdb oracle SQL) pair over the driver-generated tables.

Engine-portability rules used throughout (so Spark and DuckDB hash-match):
- every computed column is aliased identically on both sides;
- float aggregates go through exact decimal sums:
  sum(round(x, 6)::decimal(28,6))::double — associativity-proof, so Spark's
  partial aggregation order can't shift the result;
- similarities/ratios are rounded to 6 dp on both sides, and every top-k /
  row_number orders by (measure, unique id) so ties are deterministic;
- hashes are md5-based (identical everywhere); MinHash slots compare as
  fixed-length hex strings; SimHash bits come from hex-digit parity;
- row_number()/size()/length() are cast to bigint to match DuckDB's types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions import text_analysis as ta
from ocr_vector_db_spark.functions import validators
from ocr_vector_db_spark.functions.chunking import chunk_fixed_col
from ocr_vector_db_spark.operators import dedup, grouping, knn, metrics
from ocr_vector_db_spark.session import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Built-DataFrame memo for queries whose PLAN CONSTRUCTION is expensive
# (generated wide SQL: each call costs a ~0.45s parse+analyze at 64 dims).
# DataFrames are immutable lazy plans, so reuse is safe; keyed per
# (session, sf) like session._TABLE_CACHE.
_PLAN_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def dsum(c, scale: int = 6):
    """Order-independent float sum: round per-row (identical doubles on both
    engines), sum exactly as decimal, emit double."""
    return F.sum(F.round(c, scale).cast(f"decimal(28,{scale})")).cast("double")


def _sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(ROUND({expr},{scale}) AS DECIMAL(28,{scale}))) AS DOUBLE)"




def plan_memo_hit(spark, tail: str):
    """Session-memoized built plan WITH internal cached sub-frames — the
    `_fixture_store` discipline (nonsql.py) generalized for the
    constant-fixture decode goldens (optimization r15). Returns the
    memoized output DataFrame, or None when the caller must build (and
    then `plan_memo_put`).

    The fixture-golden plans cost seconds of EAGER driver analysis per
    construction (deep per-asset decode → signature → banded-join trees,
    re-analyzed under every operator), while every EXECUTION still
    decodes/hashes from the fixture rows — results are never memoized.
    On re-entry after a spark.catalog.clearCache() (bench.py clears
    between timed queries, which also drops the persist MARK), the
    sub-frame cache marks are re-asserted so the next action
    re-materializes each shared subtree once instead of once per plan
    reference."""
    key = (spark.sparkContext.applicationId, tail)
    if key not in _PLAN_MEMO:
        return None
    out, cached = _PLAN_MEMO[key]
    for df in cached:
        if not df.storageLevel.useMemory:
            df.cache()
    return out


def plan_memo_put(spark, tail: str, out, cached):
    """Record a built plan + its cache-marked sub-frames (see
    `plan_memo_hit`) and return `out`."""
    _PLAN_MEMO[(spark.sparkContext.applicationId, tail)] = (out, cached)
    return out
