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

Scoring math is literally shared with the on-the-fly path — both this
module and `retrieval.bm25_scores` build their per-(doc, term)
contribution from the single `retrieval._bm25_score_cols` expression, so
the indexed and scan formulations cannot drift; a test additionally
asserts equal results.

Update story mirrors IVFIndex: append new docs' postings (and fold their
(dl, count) into stats) or rebuild per ingest batch; BM25 tolerates stale
avgdl/N between rebuilds the same way ivfflat tolerates centroid drift.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.retrieval import (
    _bm25_score_cols,
    _dsum6,
    bounded_window,
)
from ocr_vector_db_spark.operators.tfidf import words_col


def _tokenized(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __ws) tokenization shared by build() and add()."""
    return docs.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("__ws")
    )


def _postings_of(toks: DataFrame, n_buckets: int) -> DataFrame:
    """(id, dl, term, tf, bucket) postings rows — the ONE definition of the
    physical layout, shared by build() and add()."""
    return (
        toks.select("id", F.size("__ws").alias("dl"),
                    F.explode("__ws").alias("term"))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )


def _read_stats(spark: SparkSession, path: str) -> DataFrame:
    """Latest-committed stats read: resolve the current generation of the
    1-row stats table (see operators/index_maint.py — the commit marker is
    atomic, so there is always exactly one readable committed version)."""
    from ocr_vector_db_spark.operators.index_maint import current_gen_dir

    return spark.read.parquet(
        current_gen_dir(spark, os.path.join(path, "stats"))
    )


def _commit_stats(spark: SparkSession, path: str, new_stats: DataFrame) -> None:
    """Crash-safe replacement of the 1-row stats table: write the complete
    new copy as the NEXT generation of `{path}/stats`, publish it with a
    single atomic marker create, GC superseded generations. No live data is
    ever renamed or deleted before its replacement is committed, so every
    crash point (and every concurrent read) sees a complete committed
    version — the previous one until the marker lands, the new one after.

    Single-writer contract: concurrent `add()` calls are NOT supported —
    the read-fold-commit cycle is not transactional, so a concurrent
    writer's fold can be lost (last commit wins). Serialize index updates
    (the reference's ingest path is likewise a single batch writer)."""
    from ocr_vector_db_spark.operators.index_maint import (
        commit_generation,
        gc_generations,
        next_gen_dir,
    )

    stats_root = os.path.join(path, "stats")
    n, dest = next_gen_dir(spark, stats_root)
    new_stats.write.mode("overwrite").parquet(dest)
    commit_generation(spark, stats_root, n)
    gc_generations(spark, stats_root)


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
        from ocr_vector_db_spark.operators.index_maint import (
            commit_generation,
            init_generation,
        )

        toks = _tokenized(docs, id_col, text_col)
        postings_root = os.path.join(path, "postings")
        n_gen, dest = init_generation(spark, postings_root)
        _postings_of(toks, n_buckets).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(dest)
        commit_generation(spark, postings_root, n_gen)
        # stats over ALL docs — a zero-token doc contributes dl=0 to avgdl
        # and counts in N, matching the scan path's semantics exactly (the
        # explode above would silently drop it). total_dl is kept as an
        # EXACT integer so incremental add() folds are associative:
        # avgdl is always one double division of exact integers (the same
        # IEEE op AVG() performs), so build(A∪B) ≡ build(A)+add(B) to the
        # last bit, not just within float tolerance.
        row = toks.select(F.size("__ws").alias("dl")).agg(
            F.count("*").alias("n"), F.sum("dl").alias("s")
        ).head()
        n, total = int(row["n"]), int(row["s"] or 0)
        _commit_stats(spark, path, spark.createDataFrame(
            [(n, total / n if n else 0.0, n_buckets, total)],
            "n_docs bigint, avgdl double, n_buckets int, total_dl bigint",
        ))
        return cls(spark, path, n_buckets)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LexicalIndex":
        n_buckets = int(
            _read_stats(spark, path).head()["n_buckets"]
        )
        return cls(spark, path, n_buckets)

    # ------------------------------------------------------------ increment

    def add(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        assume_new: bool = False,
    ) -> int:
        """Incremental index update, IVFIndex.add parity: append the new
        docs' postings into their buckets and fold (count, mean dl) into
        the 1-row stats. Per-term df needs NO maintenance — search derives
        it from the pruned postings slice at query time, so it is always
        exact. Returns the number of docs actually added.

        Re-add guard: incoming ids are anti-joined against the indexed ids
        by default, so re-submitting an already-indexed doc is a no-op
        instead of silently double-counting its postings and inflating
        (N, avgdl, tf, df). The guard costs one distinct over the postings'
        id column; pass ``assume_new=True`` to skip it when the pipeline
        guarantees newness upstream (e.g. ingest already deduped on doc_id).

        Stats commit is crash-safe (`_commit_stats`); single-writer
        contract applies. If a crash lands between the postings append and
        the stats commit, the appended docs' (count, dl) fold is lost —
        stats go stale exactly the way the module docstring allows (search
        stays well-defined; `build()` restores exactness)."""
        toks = _tokenized(docs, id_col, text_col)
        if not assume_new:
            indexed = self.postings().select("id").distinct()
            toks = toks.join(indexed, "id", "left_anti")
        toks = toks.cache()  # two consumers: postings append + stats fold
        try:
            # Materialize the batch (and its stats fold) BEFORE the append:
            # the anti-join above reads the postings path, so evaluating it
            # after the append would see the batch's own rows and drop
            # everything. The head() pins the cache to the pre-append state.
            new = toks.select(F.size("__ws").alias("dl")).agg(
                F.count("*").alias("n"), F.sum("dl").alias("s")
            ).head()
            from ocr_vector_db_spark.operators.index_maint import (
                current_gen_dir,
            )

            _postings_of(toks, self.n_buckets).write.mode(
                "append"
            ).partitionBy("bucket").parquet(
                current_gen_dir(self.spark, os.path.join(self.path, "postings"))
            )
            old = _read_stats(self.spark, self.path).head()
            n_docs = int(old["n_docs"]) + int(new["n"])
            # exact integer fold — see build(): incremental ≡ full rebuild.
            # Indexes persisted before total_dl existed reconstruct it from
            # avgdl·n (rounded; those stats were float-folded anyway) —
            # the commit below upgrades them to the exact schema.
            old_total = (
                int(old["total_dl"])
                if "total_dl" in old.__fields__ and old["total_dl"] is not None
                else int(round(float(old["avgdl"]) * int(old["n_docs"])))
            )
            total_dl = old_total + int(new["s"] or 0)
            _commit_stats(
                self.spark,
                self.path,
                self.spark.createDataFrame(
                    [(n_docs, total_dl / n_docs if n_docs else 0.0,
                      self.n_buckets, total_dl)],
                    "n_docs bigint, avgdl double, n_buckets int,"
                    " total_dl bigint",
                ),
            )
            return int(new["n"])
        finally:
            toks.unpersist()

    # ---------------------------------------------------------- maintenance

    def compact(self) -> int:
        """Collapse each postings bucket to one file after many add()
        appends (OPTIMIZE analogue; see operators/index_maint.py). Returns
        the postings row count. Single-writer contract."""
        from ocr_vector_db_spark.operators.index_maint import (
            compact_partitioned,
        )

        return compact_partitioned(
            self.spark, os.path.join(self.path, "postings"),
            "bucket", self.n_buckets,
        )

    # -------------------------------------------------------------- search

    def postings(self) -> DataFrame:
        from ocr_vector_db_spark.operators.index_maint import current_gen_dir

        return self.spark.read.parquet(
            current_gen_dir(self.spark, os.path.join(self.path, "postings"))
        )

    def stats(self) -> DataFrame:
        return _read_stats(self.spark, self.path).select("n_docs", "avgdl")

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
