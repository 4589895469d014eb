"""Sequence packing — grouping documents into fixed-token-budget training
sequences.

An LLM-data-pipeline staple downstream of everything the reference produces
(its pipeline ends at embedded fragments; a pretraining pipeline's last hop
is packing tokenized documents into context-window-sized rows). The exact
bin-packing that trainers use (first-fit-decreasing) is inherently
sequential; the distributed-standard approximation is CONTIGUOUS GREEDY
packing: fix a deterministic document order per shard, prefix-sum the token
counts, and open a new pack each time the running total crosses the budget.
A document is assigned to the pack its FIRST token lands in
(pack_id = floor((cumsum - tokens) / budget)), so packs can overflow by at
most one document — the "document-boundary packing" used when cross-document
attention bleed must be avoided.

Scale shape: ONE window (prefix sum) partitioned by shard — no global sort,
no driver loop. Shard by whatever already partitions the corpus (source,
language, date bucket); parallelism = #shards, and each shard's window is a
single per-partition sorted stream. The per-pack rollup is a hash agg on
(shard, pack_id).

When the natural shard key is low-cardinality (a handful of languages over
a 100 TB corpus = a handful of single-reducer sorted streams), pass
``sub_shards=N``: each shard is salted into N deterministic sub-shards
(md5(doc_id) mod N — engine-portable, no xxhash dependency in the oracle),
so window partitions stay bounded at corpus_size / (shards * N). Packs are
per-(sub-)shard by definition, so salting only relabels WHICH pack a doc
joins — budget/overflow semantics per pack are identical, and
``sub_shards=1`` is exactly the unsalted operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ocr_vector_db_spark.functions.text_analysis import token_count_col


def sub_shard_salt(id_col: Column, sub_shards: int) -> Column:
    """Deterministic bounded salt in [0, sub_shards): first 8 hex chars of
    md5(id) as an int, mod N. md5+conv (not xxhash64) so a SQL oracle on any
    engine reproduces it bit-for-bit."""
    return F.pmod(
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(sub_shards),
    )


def pack_documents(
    docs: DataFrame,
    budget: int,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: Column | None = None,
    sub_shards: int = 1,
) -> DataFrame:
    """(shard, doc_id, tokens, cum_tokens, pack_id): contiguous greedy
    packing of each shard's documents (ordered by id) into `budget`-token
    packs. `tokens` defaults to the whitespace-token count of `text_col`.
    `sub_shards > 1` salts each shard into that many deterministic
    sub-shards (shard value becomes "<shard>#<salt>") so no window
    partition outgrows an executor at corpus scale."""
    if budget <= 0:
        raise ValueError(f"pack_documents budget must be positive, got {budget}")
    if sub_shards < 1:
        raise ValueError(f"sub_shards must be >= 1, got {sub_shards}")
    shard = F.col(shard_col)
    if sub_shards > 1:
        shard = F.concat_ws(
            "#",
            shard.cast("string"),
            sub_shard_salt(F.col(id_col), sub_shards).cast("string"),
        )
    tok = tokens if tokens is not None else token_count_col(F.col(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.select(
        shard.alias("shard"),
        F.col(id_col),
        tok.cast("bigint").alias("tokens"),
    ).select(
        "shard",
        id_col,
        "tokens",
        F.sum("tokens").over(w).alias("cum_tokens"),
    ).withColumn(
        "pack_id",
        F.floor((F.col("cum_tokens") - F.col("tokens")) / F.lit(budget)).cast(
            "bigint"
        ),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack rollup: (shard, pack_id, n_docs, pack_tokens, fill_ratio).
    fill_ratio > 1 marks boundary overflow (a doc straddling the budget)."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tokens").alias("pack_tokens"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("pack_tokens") / F.lit(budget), 6)
        )
    )
