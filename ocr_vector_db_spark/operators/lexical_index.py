"""Persistent inverted index for BM25 — the sparse twin of IVFIndex.

`operators/retrieval.py::bm25_topk` tokenizes and scores the corpus per
query — correct, but a 100 TB corpus cannot be rescanned per search. The
production shape (Lucene/Elasticsearch do exactly this, and the reference's
pgvector GIN index is the same idea for jsonb) is a PERSISTED postings
table whose physical layout prunes the scan down to the query's own terms:

  build:  one tokenize pass → postings (term, id, tf, dl) written
          partitioned by `bucket = pmod(xxhash64(term), n_buckets)`, plus a
          1-row stats table (N, avgdl) — the layout IS the index, exactly
          like IVFIndex's cluster_id partitioning.
  search: `bucket IN (buckets of the query terms)` is a partition-pruned
          scan reading n_query_terms/n_buckets of the postings (check
          .explain: PartitionFilters), then `term IN (...)` row-group
          skips inside; df comes from a per-term aggregate of the pruned
          slice, stats from the 1-row table — both broadcast. Per-query
          work is O(matching postings), independent of corpus size.

Scoring math is shared with the on-the-fly path (`_bm25_score_cols`), so
the indexed and scan formulations are provably identical — the test
asserts equal results.

Update story mirrors IVFIndex: append new docs' postings (and fold their
(dl, count) into stats) or rebuild per ingest batch; BM25 tolerates stale
avgdl/N between rebuilds the same way ivfflat tolerates centroid drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.retrieval import _dsum6, bounded_window
from ocr_vector_db_spark.operators.tfidf import words_col


def _bm25_score_cols(k1: float, b: float):
    """idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)) — Lucene's BM25,
    shared by the scan path (retrieval.bm25_scores) and the indexed path."""
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return idf * tf_part


class LexicalIndex:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets

    # --------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "LexicalIndex":
        """One tokenize pass → bucketed postings + 1-row corpus stats.
        `n_buckets` trades pruning granularity against file count: at
        100 TB use O(1k) buckets so a 5-term query reads ≤ 5 buckets
        (~0.5% of postings) while each bucket stays multi-file splittable."""
        toks = docs.select(
            F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("__ws")
        )
        postings = (
            toks.select("id", F.size("__ws").alias("dl"),
                        F.explode("__ws").alias("term"))
            .groupBy("id", "dl", "term")
            .agg(F.count("*").alias("tf"))
            .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        )
        postings.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(path, "postings")
        )
        # stats over ALL docs — a zero-token doc contributes dl=0 to avgdl
        # and counts in N, matching the scan path's semantics exactly (the
        # explode above would silently drop it)
        stats = toks.select(F.size("__ws").alias("dl")).agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        stats.withColumn("n_buckets", F.lit(n_buckets)).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "stats"))
        return cls(spark, path, n_buckets)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LexicalIndex":
        n_buckets = int(
            spark.read.parquet(os.path.join(path, "stats")).head()["n_buckets"]
        )
        return cls(spark, path, n_buckets)

    # ------------------------------------------------------------ increment

    def add(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> int:
        """Incremental index update, IVFIndex.add parity: append the new
        docs' postings into their buckets and fold (count, mean dl) into
        the 1-row stats. Per-term df needs NO maintenance — search derives
        it from the pruned postings slice at query time, so it is always
        exact. Returns the number of docs added."""
        toks = docs.select(
            F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("__ws")
        )
        postings = (
            toks.select("id", F.size("__ws").alias("dl"),
                        F.explode("__ws").alias("term"))
            .groupBy("id", "dl", "term")
            .agg(F.count("*").alias("tf"))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(self.n_buckets))
            )
        )
        postings.write.mode("append").partitionBy("bucket").parquet(
            os.path.join(self.path, "postings")
        )
        old = self.spark.read.parquet(os.path.join(self.path, "stats")).head()
        new = toks.select(F.size("__ws").alias("dl")).agg(
            F.count("*").alias("n"), F.sum("dl").alias("s")
        ).head()
        n_docs = int(old["n_docs"]) + int(new["n"])
        total_dl = float(old["avgdl"]) * int(old["n_docs"]) + float(new["s"] or 0)
        self.spark.createDataFrame(
            [(n_docs, total_dl / n_docs if n_docs else 0.0, self.n_buckets)],
            "n_docs bigint, avgdl double, n_buckets int",
        ).write.mode("overwrite").parquet(os.path.join(self.path, "stats"))
        return int(new["n"])

    # -------------------------------------------------------------- search

    def postings(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    def stats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "stats")).select(
            "n_docs", "avgdl"
        )

    def search(
        self,
        query_terms: list[str],
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """(id, bm25, rank) top-k — identical output contract (and scores)
        to retrieval.bm25_topk, but reading only the query terms' buckets."""
        terms = sorted(set(t.lower() for t in query_terms))
        buckets = sorted(
            {r.b for r in self.spark.createDataFrame(
                [(t,) for t in terms], "term string"
            ).select(
                F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).alias("b")
            ).collect()}
        )
        pruned = (
            self.postings()
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
        )
        df_ = pruned.groupBy("term").agg(F.count("*").alias("df"))
        scored = (
            pruned.join(F.broadcast(df_), "term")
            .crossJoin(F.broadcast(self.stats()))
            .groupBy("id")
            .agg(_dsum6(_bm25_score_cols(k1, b)).alias("bm25"))
            .select("id", F.round("bm25", 6).alias("bm25"))
        )
        return (
            scored.orderBy(F.desc("bm25"), F.asc("id"))
            .limit(k)
            .select(
                "id",
                "bm25",
                F.row_number()
                .over(bounded_window(F.col("bm25"), F.desc("bm25"), F.asc("id")))
                .cast("bigint")
                .alias("rank"),
            )
        )
