"""Vector math over `array<float|double>` embedding columns.

The reference stores pgvector columns and computes `1 - (embedding <=> q)`
cosine similarity in Postgres (retrieval/search.py:106). Here embeddings are
plain Spark arrays and similarity is a built-in higher-order-function
expression (`zip_with` + `aggregate`) — JVM-side, codegen-friendly, no UDF in
the hot scoring path.

Also provides the deterministic test embedder (seeded hash → unit vector) the
correctness suite uses instead of a network embedding service, mirroring the
pluggable-provider design (embedding/provider.py:9-99) with a local fake.
"""

from __future__ import annotations

import hashlib
import math
import struct

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------- spark columns


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (double-precision)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a||b|); null-safe on zero vectors (returns null)."""
    denom = norm_col(a) * norm_col(b)
    return F.when(denom != 0.0, dot_col(a, b) / denom)


def cosine_similarity_sql(a: str, b: str) -> str:
    """`cosine_similarity_col` as ONE generated-SQL expression over two
    COLUMN NAMES — parses to the identical tree (same casts, same float-op
    order, same null-safe CASE) in a single round trip, where the Column
    form pays Py4J lambda machinery per higher-order function on every
    plan construction (the q66/PQ finding; optimization r16 applies it to
    the knn_batch scoring hot path). Names are backtick-quoted; pass
    plain column names only."""
    def _norm(c: str) -> str:
        return (f"SQRT(AGGREGATE(`{c}`, 0.0D, (acc, x) -> "
                f"acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")

    dot = (f"AGGREGATE(ZIP_WITH(`{a}`, `{b}`, (x, y) -> "
           f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
           f"(acc, x) -> acc + x)")
    denom = f"({_norm(a)} * {_norm(b)})"
    return f"CASE WHEN {denom} != 0.0D THEN {dot} / {denom} END"


def l2_normalize_col(a: Column) -> Column:
    """Unit-normalize an array column. Pre-normalizing embeddings once at
    ingest turns every query-time cosine into a plain dot product — at 100 TB
    that halves the arithmetic and avoids recomputing norms per query."""
    n = norm_col(a)
    return F.when(n != 0.0, F.transform(a, lambda x: x.cast("double") / n))


def quantize_int8_col(a: Column) -> Column:
    """Symmetric per-vector int8 scalar quantization: codes = round(x·s),
    s = 127/max|x|. 4× smaller scannable state than float32 (and the cheap
    sibling of PQ's 32-384×); cosine over codes needs no dequantization —
    the scale cancels. Integer code sums are exact, so quantized scores are
    bit-reproducible across partitionings."""
    max_abs = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return F.when(
        max_abs > 0.0,
        F.transform(
            a,
            lambda x: F.round(x.cast("double") * (F.lit(127.0) / max_abs)).cast("int"),
        ),
    ).otherwise(F.transform(a, lambda x: F.lit(0)))


def int8_cosine_col(codes_a: Column, codes_b: Column) -> Column:
    """Cosine over int8 code arrays — exact bigint sums, one final divide."""
    dot = F.aggregate(
        F.zip_with(codes_a, codes_b, lambda x, y: (x * y).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    na = F.aggregate(
        codes_a, F.lit(0).cast("bigint"), lambda acc, x: acc + (x * x).cast("bigint")
    )
    nb = F.aggregate(
        codes_b, F.lit(0).cast("bigint"), lambda acc, x: acc + (x * x).cast("bigint")
    )
    denom = F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    return F.when(denom != 0.0, dot.cast("double") / denom)


# ------------------------------------------------- deterministic test embedder


def embed_text(content: str, dim: int = 64) -> list[float]:
    """Seeded-hash pseudo-random unit vector for `content`.

    Deterministic across processes (md5-based, no PYTHONHASHSEED dependence),
    so cosine rankings are reproducible without any external service.
    """
    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{content}|{counter}".encode("utf-8", errors="ignore")).digest()
        for off in range(0, 16, 4):
            if len(vals) >= dim:
                break
            (u,) = struct.unpack_from("<I", h, off)
            vals.append((u / 0xFFFFFFFF) * 2.0 - 1.0)
        counter += 1
    norm = math.sqrt(sum(v * v for v in vals))
    if norm == 0.0:
        vals[0] = 1.0
        norm = 1.0
    return [v / norm for v in vals]


def embed_udf(dim: int = 64):
    """pandas UDF batch-embedding a string column with the deterministic
    embedder. Arrow-batched; in production the body is swapped for a real
    provider call (with the reference's retry/rate-limit logic living inside
    the partition, see operators/embedding_sink)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType

    def _embed(s):
        return s.map(lambda x: embed_text(x or "", dim))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve — attach real annotation objects instead.
    _embed.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(ArrayType(DoubleType()))(_embed)
