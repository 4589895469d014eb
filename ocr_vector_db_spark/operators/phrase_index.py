"""Persisted POSITIONAL inverted index — exact phrase search at scale.

`LexicalIndex` (BM25) stores (term, id, tf): enough for bag-of-words
ranking, blind to order — it cannot distinguish "new york" from "york
new". Phrase and proximity queries need token POSITIONS in the postings
(Lucene's positional index; the reference's `plainto_tsquery` lexical
arm has the same limitation this module lifts). Layout discipline is
LexicalIndex's exactly:

  build:  one tokenize pass → postings (id, term, pos) written
          partitioned by ``bucket = pmod(xxhash64(term), n_buckets)`` —
          one row per token OCCURRENCE (parquet RLE makes the repeated
          id/term columns cheap), so the physical layout prunes any
          phrase query to its own terms' buckets.
  search: prune buckets + terms of the phrase (PartitionFilters), then
          chain equi-joins t_{j} on (id, pos == p0 + j) — each join
          handles query-term-sized slices, never the corpus. Output is
          per-doc hit count + first hit position, top-k by hits.
  add:    append the batch's postings (re-add guarded), same
          single-writer/crash-window contract as LexicalIndex.add —
          no stats table at all, so there is nothing to go stale.

Tokenization is `tfidf.words_col` (shared with LexicalIndex/BM25), so
positions here are the SAME positions q89's scan path would see, and a
DuckDB oracle can re-derive every hit from the raw text (q131).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.minhash_index import _error_condition
from ocr_vector_db_spark.operators.tfidf import words_col


def _positional_postings(
    docs: DataFrame, n_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, term, pos, bucket) — the ONE definition of the layout."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(words_col(F.col(text_col))).alias("pos", "term"),
        )
        .select(
            "id", "term", F.col("pos").cast("int").alias("pos"),
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).alias("bucket"),
        )
    )


class PositionalIndex:
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
    ) -> "PositionalIndex":
        from ocr_vector_db_spark.operators.index_maint import (
            commit_generation,
            init_generation,
            write_small_file,
        )

        root = os.path.join(path, "postings")
        n_gen, dest = init_generation(spark, root)
        _positional_postings(docs, n_buckets, id_col, text_col).write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(dest)
        commit_generation(spark, root, n_gen)
        import json

        write_small_file(
            spark, os.path.join(path, "meta.json"),
            json.dumps({"n_buckets": n_buckets}).encode("utf-8"),
        )
        return cls(spark, path, n_buckets)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PositionalIndex":
        import json

        from ocr_vector_db_spark.operators.index_maint import read_small_file

        meta = json.loads(
            read_small_file(spark, os.path.join(path, "meta.json"))
        )
        return cls(spark, path, meta["n_buckets"])

    # ---------------------------------------------------------------- reads

    def postings(self) -> DataFrame:
        from pyspark.errors import AnalysisException
        from pyspark.sql import types as T

        from ocr_vector_db_spark.operators.index_maint import current_gen_dir

        try:
            return self.spark.read.parquet(
                current_gen_dir(self.spark, os.path.join(self.path, "postings"))
            )
        except AnalysisException as exc:
            # empty build wrote no files — typed empty relation, same two
            # qualifying conditions as the other index families
            if _error_condition(exc) not in (
                "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"
            ):
                raise
            return self.spark.createDataFrame([], T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("term", T.StringType()),
                T.StructField("pos", T.IntegerType()),
                T.StructField("bucket", T.LongType()),
            ]))

    # ------------------------------------------------------------ increment

    def add(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        assume_new: bool = False,
    ) -> int:
        """Append a batch's positional postings (LexicalIndex.add parity:
        anti-join re-add guard, ``assume_new`` escape, single-writer).
        Returns docs added. No stats to fold — nothing can go stale."""
        from ocr_vector_db_spark.operators.index_maint import current_gen_dir

        batch = docs.select(F.col(id_col).alias("id"), F.col(text_col)
                            .alias("__text"))
        if not assume_new:
            indexed = self.postings().select("id").distinct()
            batch = batch.join(indexed, "id", "left_anti")
        batch = batch.cache()
        try:
            n = batch.select("id").distinct().count()  # pin pre-append
            _positional_postings(
                batch, self.n_buckets, "id", "__text"
            ).write.mode("append").partitionBy("bucket").parquet(
                current_gen_dir(self.spark, os.path.join(self.path, "postings"))
            )
            return n
        finally:
            batch.unpersist()

    def compact(self) -> int:
        from ocr_vector_db_spark.operators.index_maint import (
            compact_partitioned,
        )

        return compact_partitioned(
            self.spark, os.path.join(self.path, "postings"),
            "bucket", self.n_buckets,
        )

    # -------------------------------------------------------------- search

    def _pruned(self, terms: list[str]) -> DataFrame:
        buckets = sorted({
            r.b for r in self.spark.createDataFrame(
                [(t,) for t in sorted(set(terms))], "term string"
            ).select(
                F.pmod(F.xxhash64("term"), F.lit(self.n_buckets)).alias("b")
            ).collect()
        })
        return (
            self.postings()
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(sorted(set(terms))))
        )

    def phrase_search(self, phrase: str, k: int = 10) -> DataFrame:
        """(id, n_hits, first_pos, rank): docs containing the EXACT token
        sequence of ``phrase`` (under the index's tokenizer), ranked by
        hit count. The join chain anchors on the phrase's first term and
        steps j tokens forward per term — every join input is a pruned
        query-term slice; a one-term phrase degenerates to a per-doc
        count. Deterministic ties: (n_hits DESC, id)."""
        from ocr_vector_db_spark.operators.retrieval import bounded_window

        terms = [t for t in phrase.lower().split() if t]
        if not terms:
            raise ValueError("empty phrase")
        # each term re-filters the pruned scan: n small partition-pruned
        # parquet reads (one per phrase term), kept lazy so the returned
        # plan is self-contained
        pruned = self._pruned(terms)
        hits = (
            pruned.filter(F.col("term") == terms[0])
            .select("id", F.col("pos").alias("p0"))
        )
        for j, t in enumerate(terms[1:], start=1):
            nxt = pruned.filter(F.col("term") == t).select(
                "id", (F.col("pos") - j).alias("p0")
            )
            hits = hits.join(nxt, ["id", "p0"])
        agg = hits.groupBy("id").agg(
            F.count("*").cast("bigint").alias("n_hits"),
            F.min("p0").cast("int").alias("first_pos"),
        )
        return (
            agg.orderBy(F.desc("n_hits"), F.asc("id"))
            .limit(k)
            .select(
                "id", "n_hits", "first_pos",
                F.row_number().over(bounded_window(
                    F.col("n_hits"), F.desc("n_hits"), F.asc("id")
                )).cast("bigint").alias("rank"),
            )
        )
