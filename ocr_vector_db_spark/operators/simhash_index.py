"""Persisted SimHash index — the Hamming-space sibling of MinHashIndex.

`dedup.simhash_near_dup_pairs` (q88) self-joins one corpus's pigeonhole
bands: right for a one-shot pass, wrong for ingestion — every new batch
must screen against the FULL historical corpus without re-hashing it.
Same persisted-signature discipline as MinHashIndex (which see for the
append-ordering and crash-window rationale):

  build:  one SimHash pass → signatures (doc, simhash) plus banding rows
          (doc, band, val) written partitioned by
          ``bucket = pmod(xxhash64(band, val), n_buckets)`` — the r+1
          pigeonhole bands of `dedup.simhash_band_widths`, so two
          signatures within Hamming distance r MUST collide on ≥ 1 stored
          band row.
  add:    append the accepted batch's signatures + bands (re-add guarded).
  screen: hash ONLY the new batch (O(batch)), equi-join its band rows
          against the stored layout on (bucket, band, val) — co-keyed with
          the physical partitioning, bucket-pruned for small batches —
          then verify candidates exactly with
          bit_count(sig_new XOR sig_corpus) ≤ r. Nothing all-pairs,
          nothing corpus-rescanned.
  dedup_new: the ingestion gate — batch docs with NO indexed signature
          within Hamming r.

Hashing is the exact scheme of `dedup.simhash_col` (md5 hex-digit parity
majority votes), so the screen is oracle-reproducible: q127 is q88's SQL
machinery restricted to cross-side (new × indexed) pairs.

MinHash vs SimHash as the gate: MinHash estimates set-Jaccard (robust to
length skew, tunable via bands×rows); SimHash is a single 64-bit word per
doc with EXACT Hamming verification — 8 bytes of state and a bit_count
per candidate, the cheaper screen when "near-dup" means tiny edits.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.dedup import (
    simhash_band_widths,
    simhash_col,
)
from ocr_vector_db_spark.operators.minhash_index import _error_condition


def _sigs_of(docs: DataFrame, bits: int, id_col: str,
             text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc"),
        simhash_col(F.col(text_col), bits).alias("simhash"),
    )


def _bands_of(sig: DataFrame, bits: int, r: int, n_buckets: int) -> DataFrame:
    """(doc, band, val, bucket) — the ONE definition of the banded layout,
    shared by build/add (store side) and screen (batch side)."""
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.shiftright(F.col("simhash"), lo)
            .bitwiseAND(F.lit((1 << w) - 1)).alias("val"),
        )
        for j, (lo, w) in enumerate(simhash_band_widths(bits, r))
    ]
    return (
        sig.select("doc", F.explode(F.array(*band_structs)).alias("b"))
        .select("doc", F.col("b.band").alias("band"),
                F.col("b.val").alias("val"))
        .withColumn(
            "bucket", F.pmod(F.xxhash64("band", "val"), F.lit(n_buckets))
        )
    )


class SimHashIndex:
    def __init__(self, spark: SparkSession, path: str, bits: int, r: int,
                 n_buckets: int):
        self.spark = spark
        self.path = path
        self.bits = bits
        self.r = r
        self.n_buckets = n_buckets

    # ------------------------------------------------------------ signature

    def _sig_expr(self, docs: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
        """docs → (doc, simhash) — the ONE place a subclass swaps the
        signature function while keeping the banded layout, append
        ordering, re-add guard, compaction and screen verification
        (image_hash.PhashIndex: 64-bit dHash over raster frames). Must
        return a bigint `simhash` whose Hamming distance is the
        near-dup metric."""
        return _sigs_of(docs, self.bits, id_col, text_col)

    # --------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        bits: int = 16,
        r: int = 2,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "SimHashIndex":
        from ocr_vector_db_spark.operators.index_maint import write_small_file

        idx = cls(spark, path, bits, r, n_buckets)
        sig = idx._sig_expr(docs, id_col, text_col).cache()
        try:
            sig.count()
            idx._append(sig, overwrite=True)
        finally:
            sig.unpersist()
        write_small_file(
            spark, os.path.join(path, "meta.json"),
            json.dumps({"bits": bits, "r": r,
                        "n_buckets": n_buckets}).encode("utf-8"),
        )
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SimHashIndex":
        from ocr_vector_db_spark.operators.index_maint import read_small_file

        m = json.loads(
            read_small_file(spark, os.path.join(path, "meta.json"))
        )
        return cls(spark, path, m["bits"], m["r"], m["n_buckets"])

    # ---------------------------------------------------------------- reads

    def _table_dir(self, name: str) -> str:
        from ocr_vector_db_spark.operators.index_maint import current_gen_dir

        return current_gen_dir(self.spark, os.path.join(self.path, name))

    def signatures(self) -> DataFrame:
        return self.spark.read.parquet(self._table_dir("signatures"))

    def bands_table(self) -> DataFrame:
        from pyspark.errors import AnalysisException
        from pyspark.sql import types as T

        try:
            return self.spark.read.parquet(self._table_dir("bands"))
        except AnalysisException as exc:
            # empty build wrote no band files — synthesize the typed empty
            # relation (MinHashIndex.bands_table's contract: ONLY these
            # two conditions qualify; anything else must raise)
            if _error_condition(exc) not in (
                "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"
            ):
                raise
            doc_t = self.signatures().schema["doc"].dataType
            return self.spark.createDataFrame([], T.StructType([
                T.StructField("doc", doc_t),
                T.StructField("band", T.IntegerType()),
                T.StructField("val", T.LongType()),
                T.StructField("bucket", T.LongType()),
            ]))

    def _append(self, sig: DataFrame, overwrite: bool = False) -> None:
        """Bands FIRST, signatures second — the re-add anti-join reads the
        signatures path, and writing it first would invalidate the cached
        plan mid-append (MinHashIndex._append's finding; same crash-window
        adjudication: orphan band rows can never screen-hit, the inner
        signature join filters them)."""
        from ocr_vector_db_spark.operators.index_maint import (
            commit_generation,
            init_generation,
        )

        bands_root = os.path.join(self.path, "bands")
        sigs_root = os.path.join(self.path, "signatures")
        if overwrite:
            _, bands_dest = init_generation(self.spark, bands_root)
            _, sigs_dest = init_generation(self.spark, sigs_root)
        else:
            bands_dest = self._table_dir("bands")
            sigs_dest = self._table_dir("signatures")
        mode = "overwrite" if overwrite else "append"
        _bands_of(sig, self.bits, self.r, self.n_buckets).write.mode(
            mode
        ).partitionBy("bucket").parquet(bands_dest)
        sig.write.mode(mode).parquet(sigs_dest)
        if overwrite:
            commit_generation(self.spark, bands_root, 1)
            commit_generation(self.spark, sigs_root, 1)

    # ------------------------------------------------------------ increment

    def add(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        assume_new: bool = False,
    ) -> int:
        """Append a batch's signatures + bands (MinHashIndex.add parity:
        anti-join re-add guard, ``assume_new`` escape for ledger-guarded
        streaming, single-writer contract). Returns docs added."""
        sig = self._sig_expr(docs, id_col, text_col)
        if not assume_new:
            indexed = self.signatures().select("doc").distinct()
            sig = sig.join(indexed, "doc", "left_anti")
        sig = sig.cache()
        try:
            n = sig.count()  # materialize before the append (self-read)
            self._append(sig)
            return n
        finally:
            sig.unpersist()

    # ---------------------------------------------------------- maintenance

    def compact(self) -> int:
        """Collapse each band bucket to one file and bound the signature
        file count (OPTIMIZE analogue). Returns the signature row count."""
        from pyspark.errors import AnalysisException

        from ocr_vector_db_spark.operators.index_maint import (
            compact_partitioned,
            compact_plain,
        )

        try:
            compact_partitioned(
                self.spark, os.path.join(self.path, "bands"),
                "bucket", self.n_buckets,
            )
        except AnalysisException as exc:
            if _error_condition(exc) not in (
                "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"
            ):
                raise
        return compact_plain(
            self.spark, os.path.join(self.path, "signatures"),
            max(self.n_buckets // 4, 1),
        )

    # -------------------------------------------------------------- screen

    def screen(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """(new_id, corpus_id, hamming) — every new-batch doc within
        Hamming ≤ r of an INDEXED signature. EXACT within the radius: the
        pigeonhole guarantee means no candidate is missed, and bit_count
        verification filters the band collisions. Only the batch is
        hashed; the corpus side is the slim band equi-join (keyed like the
        stored partitioning) + a signature join on candidates only."""
        new_sig = self._sig_expr(new_docs, id_col, text_col)
        new_banded = _bands_of(new_sig, self.bits, self.r, self.n_buckets)
        cand = (
            new_banded.alias("x")
            .join(self.bands_table().alias("y"), ["bucket", "band", "val"])
            .select(F.col("x.doc").alias("new_id"),
                    F.col("y.doc").alias("corpus_id"))
            .dropDuplicates(["new_id", "corpus_id"])
        )
        sig_a = new_sig.select(F.col("doc").alias("new_id"),
                               F.col("simhash").alias("sig_a"))
        sig_b = self.signatures().select(F.col("doc").alias("corpus_id"),
                                         F.col("simhash").alias("sig_b"))
        hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        return (
            cand.join(sig_a, "new_id")
            .join(sig_b, "corpus_id")
            .withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= self.r)
            .select("new_id", "corpus_id", "hamming")
        )

    def dedup_new(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """The ingestion gate: batch docs with NO indexed signature within
        Hamming r. `add` the result to accept survivors (MinHashIndex
        scope note applies: intra-batch dups are the one-shot problem)."""
        dupes = (
            self.screen(new_docs, id_col, text_col)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        return new_docs.join(dupes, id_col, "left_anti")
