"""Pluggable embedding provider + the external-call harness.

The reference drives a remote embedding API (Gemini/OpenAI/Voyage,
embedding/provider.py:9-99) through char-budget batching
(shared/batching.py:12-66), RPM rate limiting and exponential-backoff retry
(storage/vector_store.py:47-139), and a dimension sanity check
(embedding/provider.py:102-135). Here those semantics live INSIDE the
partition (mapPartitions): Spark distributes fragments, each task batches
and throttles its own provider calls, and the deterministic local provider
keeps tests hermetic. Parallelism against a rate-limited service is bounded
by coalescing the embed stage, not by configuring the cluster.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_vector_db_spark.functions.vector import embed_text


class EmbeddingProvider:
    """Interface: embed a batch of texts → list of vectors."""

    dim: int = 64

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        raise NotImplementedError

    def embed_query(self, text: str) -> list[float]:
        return self.embed_documents([text])[0]


class DeterministicProvider(EmbeddingProvider):
    """Seeded-hash unit vectors — the hermetic test/CI provider."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        return [embed_text(t or "", self.dim) for t in texts]


class RateLimitError(RuntimeError):
    pass


def iter_by_char_budget(
    items: list,
    char_budget: int,
    max_batch_size: int,
    max_items_per_request: int = 0,
    get_content=lambda x: x,
) -> Iterator[list]:
    """Batch items by total-chars AND item-count budgets
    (shared/batching.py:12-66 semantics)."""
    if not items:
        return
    item_limit = max_items_per_request if max_items_per_request > 0 else max_batch_size
    item_limit = min(item_limit, max_batch_size)
    batch: list = []
    chars = 0
    for item in items:
        n = len(get_content(item))
        exceed_chars = char_budget > 0 and chars + n > char_budget
        exceed_items = len(batch) >= item_limit
        if batch and (exceed_chars or exceed_items):
            yield batch
            batch, chars = [], 0
        batch.append(item)
        chars += n
    if batch:
        yield batch


def call_with_retry(
    fn,
    max_attempts: int = 6,
    base_backoff: float = 20.0,
    rpm: int = 0,
    sleep=time.sleep,
):
    """Retry on rate-limit errors with ×1.5 exponential backoff
    (vector_store.py:94-137): backoff = max(20, rpm-interval)·1.5^attempt,
    non-rate-limit errors propagate immediately."""
    interval = (60.0 / rpm) if rpm > 0 else 0.0
    backoff = max(base_backoff, interval) or base_backoff
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as exc:
            msg = str(exc).lower()
            rate_limited = isinstance(exc, RateLimitError) or any(
                tok in msg for tok in ("ratelimit", "rate limit", "rpm", "tpm")
            )
            if not rate_limited or attempt >= max_attempts - 1:
                raise
            attempt += 1
            sleep(backoff * (1.5**attempt))


def check_dimension(provider: EmbeddingProvider, expected_dim: int) -> bool:
    """Probe the provider with a sentinel and compare dimensions
    (embedding/provider.py:102-135)."""
    probe = provider.embed_documents(["__dim_check__"])[0]
    return len(probe) == expected_dim


def embed_with_provider(
    df: DataFrame,
    provider_factory,
    text_col: str = "content",
    out_col: str = "embedding",
    batch_size: int = 64,
    char_budget: int = 0,
    rpm: int = 0,
    max_parallel_tasks: int | None = None,
) -> DataFrame:
    """Embed a text column through an external provider, Spark-shaped:

    - `coalesce(max_parallel_tasks)` caps concurrent API callers (a
      1000-executor cluster must not open 1000 connections to a 100-RPM
      endpoint);
    - inside each partition: char-budget batches, retry + backoff, RPM
      spacing — the reference's upsert loop, minus the SQL.

    `provider_factory` is a zero-arg callable (providers are rarely
    picklable; each task builds its own client).
    """
    if max_parallel_tasks:
        df = df.coalesce(max_parallel_tasks)

    fields = df.schema.fields
    out_schema = T.StructType(fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))])
    names = [f.name for f in fields]

    def run_partition(rows):
        import pandas as pd

        provider = provider_factory()
        interval = (60.0 / rpm) if rpm > 0 else 0.0
        for pdf in rows:
            texts = pdf[text_col].fillna("").tolist()
            idx_batches = list(
                iter_by_char_budget(
                    list(range(len(texts))), char_budget, batch_size,
                    get_content=lambda i: texts[i],
                )
            )
            vectors: list = [None] * len(texts)
            for bi, batch in enumerate(idx_batches):
                embs = call_with_retry(
                    lambda b=batch: provider.embed_documents([texts[i] for i in b]),
                    rpm=rpm,
                )
                for i, v in zip(batch, embs):
                    vectors[i] = v
                if interval > 0 and bi < len(idx_batches) - 1:
                    time.sleep(interval)
            yield pd.DataFrame({**{n: pdf[n] for n in names}, out_col: vectors})

    return df.mapInPandas(run_partition, out_schema)


def embed_column(df: DataFrame, dim: int = 64, text_col: str = "content",
                 out_col: str = "embedding") -> DataFrame:
    """Hermetic fast path: deterministic provider, no throttling."""
    from ocr_vector_db_spark.functions.vector import embed_udf

    return df.withColumn(out_col, embed_udf(dim)(F.col(text_col)))
