"""Data-layout optimization: Z-order (Morton) clustering keys.

The reference's storage layer leans on single-column B-tree/partition pruning
(storage/schema.py:55-228 — per-collection partitions + expression indexes).
At 100 TB, parquet file-level min/max statistics are the analogous pruning
mechanism, but they only help along the sort order. Z-ordering interleaves
the bits of several bucketized columns into one sort key so that files end up
with narrow min/max ranges on EVERY participating column — multi-dimensional
partition pruning out of plain parquet, the same layout trick Delta
OPTIMIZE ZORDER BY applies.

Everything is built from integer arithmetic shared verbatim between Spark SQL
and DuckDB (the expression string is identical), so layout keys are
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_expr", "bucketize_expr", "zorder_key", "write_zordered"]


def bucketize_expr(col: str, lo: str, hi: str, bits: int = 8) -> str:
    """SQL expression mapping ``col`` from [lo, hi] to an integer bucket in
    [0, 2^bits). lo/hi are expression strings (usually scalar-subquery or
    literal min/max). Clamped so hi maps to the top bucket."""
    n = 1 << bits
    return (
        f"LEAST(CAST(FLOOR(({col} - ({lo})) * {n}.0 / (({hi}) - ({lo}) + 1e-9)) "
        f"AS BIGINT), {n - 1})"
    )


def morton_expr(xb: str, yb: str, bits: int = 8) -> str:
    """SQL expression interleaving the low ``bits`` bits of two bucket
    expressions into a Morton code (x in even positions, y in odd). Plain
    shifts/ands/adds — identical semantics in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xb}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({yb}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(
    df: DataFrame,
    x: str,
    y: str,
    *,
    bits: int = 8,
    bounds: dict[str, tuple[float, float]] | None = None,
    out: str = "z_key",
) -> DataFrame:
    """Attach a Morton layout key over columns ``x`` and ``y``.

    ``bounds`` maps column -> (min, max); when omitted they are computed in
    one tiny agg job (at 100 TB these come from table statistics instead —
    one 4-value broadcast either way, never a per-row shuffle).
    """
    if bounds is None:
        r = df.agg(
            F.min(x).alias("xlo"), F.max(x).alias("xhi"),
            F.min(y).alias("ylo"), F.max(y).alias("yhi"),
        ).head()
        bounds = {x: (float(r.xlo), float(r.xhi)), y: (float(r.ylo), float(r.yhi))}
    xb = bucketize_expr(x, repr(bounds[x][0]), repr(bounds[x][1]), bits)
    yb = bucketize_expr(y, repr(bounds[y][0]), repr(bounds[y][1]), bits)
    return df.withColumn(out, F.expr(morton_expr(xb, yb, bits)))


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    *,
    num_files: int = 8,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of (x, y):
    range-partition on the key (contiguous key ranges per file), sort within
    partitions, drop the key. Each output file then covers a small tile of
    the (x, y) plane, so min/max stats prune scans filtered on EITHER
    column. This is the OPTIMIZE ZORDER BY analogue for plain parquet."""
    keyed = zorder_key(df, x, y, bits=bits)
    (
        keyed.repartitionByRange(num_files, "z_key")
        .sortWithinPartitions("z_key")
        .drop("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )
