"""Iterative graph algorithms over edge DataFrames.

Extends the dedup-graph family (operators/dedup.py::connected_components —
reference parity: the duplicate-cluster analysis implied by
storage/metrics.py:60-68's duplicate groups) with PageRank-style importance
scoring, e.g. to pick the most "central" member of a near-duplicate cluster
or to rank documents by citation/link structure in a training-data pipeline.

Determinism contract (so a SQL oracle can reproduce the result bit-for-bit):
every per-iteration float is rounded to a fixed scale and neighbor
contributions are summed as DECIMAL (associativity-proof), so Spark's
partial-aggregation order cannot shift the result.

Scale notes (100 TB): each iteration is one equi-join (ranks ⋈ edges on the
src key) plus one hash agg on dst. Edges are the big side and are iteration-
invariant — they are hash-partitioned on src ONCE and cached, so every
iteration's join reuses that partitioning and only the (nodes-sized) rank
table shuffles. Ranks are checkpointed every few iterations to truncate the
lineage that would otherwise grow linearly with iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    damping: float = 0.85,
    teleport: float = 0.15,
    src: str = "src",
    dst: str = "dst",
    scale: int = 9,
    cache: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (pass both
    directions for an undirected graph).

    Every node must have out-degree >= 1 (true for symmetrized edge lists);
    dangling-node mass redistribution is therefore not needed.

    Returns (id, rank) with rank rounded to ``scale`` decimals per iteration.
    """
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    deg = deg.select(F.col(src).alias("id"), "deg")
    if cache:
        deg = deg.cache()
        edges = edges.cache()
    n = deg.count()  # one small agg job; the node table is edges >> nodes

    ranks = deg.select("id", F.round(F.lit(1.0 / n), scale).alias("rank"))
    base = teleport / n  # driver-side double, identical to SQL 0.15/n
    for i in range(iterations):
        contrib = (
            ranks.join(deg, "id")
            .join(edges, F.col("id") == F.col(src))
            .select(
                F.col(dst).alias("to_id"),
                F.round(F.col("rank") / F.col("deg"), scale).alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("to_id")
            .agg(
                F.sum(F.col("c").cast(f"decimal(28,{scale})"))
                .cast("double")
                .alias("s")
            )
            .select(
                F.col("to_id").alias("id"),
                F.round(F.lit(base) + F.lit(damping) * F.col("s"), scale).alias(
                    "rank"
                ),
            )
        )
        # Truncate lineage: without this, iteration k's plan embeds all k-1
        # prior joins and the optimizer re-plans a growing DAG each pass.
        if cache and i % 3 == 2:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
