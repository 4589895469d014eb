"""Persisted MinHash-LSH index — the dedup sibling of LexicalIndex/IVFIndex.

`dedup.minhash_lsh_candidates` (q20) self-joins one corpus's bands: the
right tool for a one-shot dedup pass. Incremental INGESTION needs a
different shape — every new batch must dedup against the FULL historical
corpus, and rescanning (re-shingling, re-hashing) 100 TB of text per batch
is not a plan. The production shape (how CCNet/RefinedWeb-style pipelines
and the reference's pre-write `doc_id` dedup, storage/vector_store.py,
generalize to near-dups) is a PERSISTED signature store:

  build:  one shingle+hash pass → signatures (doc, mh_0..mh_{K-1}) plus
          banding rows (doc, band_id, band_hash) written partitioned by
          `bucket = pmod(xxhash64(band_hash), n_buckets)`;
  add:    append the accepted batch's signatures + bands (re-add guarded);
  screen: hash ONLY the new batch (O(batch), never O(corpus)), equi-join
          its bands against the stored layout on (bucket, band_id,
          band_hash) — co-partitioned by construction, and for small
          batches the bucket column partition-prunes the read — then
          estimate Jaccard from the two signature tables on candidates
          only. Nothing all-pairs, nothing corpus-rescanned.
  dedup_new: the ingestion gate — keep only batch docs with NO indexed
          near-dup above the threshold, then `add` the survivors.

Hashing is the exact scheme of dedup.minhash_signatures (md5-salted
string-min slots), so the screen result is oracle-reproducible (q105 uses
q20's SQL machinery restricted to cross-side pairs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_vector_db_spark.operators.dedup import banded_of, minhash_signatures


def _error_condition(exc) -> str | None:
    """Spark 4 renamed getErrorClass → getCondition (FutureWarning);
    support both."""
    get = getattr(exc, "getCondition", None) or exc.getErrorClass
    return get()


class MinHashIndex:
    def __init__(self, spark: SparkSession, path: str, num_hashes: int,
                 bands: int, n: int, n_buckets: int):
        self.spark = spark
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.n = n
        self.n_buckets = n_buckets

    # --------------------------------------------------------------- build

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        num_hashes: int = 16,
        bands: int = 4,
        n: int = 2,
        n_buckets: int = 64,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "MinHashIndex":
        assert num_hashes % bands == 0
        idx = cls(spark, path, num_hashes, bands, n, n_buckets)
        # cache: _append consumes sig twice (bands + signatures writes);
        # uncached, the shingle explode + K MIN aggs would run twice
        sig = minhash_signatures(docs, num_hashes, n, text_col, id_col).cache()
        try:
            sig.count()
            idx._append(sig, overwrite=True)
        finally:
            sig.unpersist()
        # Hadoop FS, not open(): the data layout is already fs-portable
        # (local/HDFS); the meta file must not pin the index to local disk
        from ocr_vector_db_spark.operators.index_maint import write_small_file

        write_small_file(
            spark, os.path.join(path, "meta.json"),
            json.dumps({"num_hashes": num_hashes, "bands": bands, "n": n,
                        "n_buckets": n_buckets}).encode("utf-8"),
        )
        return idx

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MinHashIndex":
        from ocr_vector_db_spark.operators.index_maint import read_small_file

        m = json.loads(
            read_small_file(spark, os.path.join(path, "meta.json"))
        )
        return cls(spark, path, m["num_hashes"], m["bands"], m["n"],
                   m["n_buckets"])

    def _table_dir(self, name: str) -> str:
        from ocr_vector_db_spark.operators.index_maint import current_gen_dir

        return current_gen_dir(self.spark, os.path.join(self.path, name))

    def signatures(self) -> DataFrame:
        return self.spark.read.parquet(self._table_dir("signatures"))

    def signatures_of(self, docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
        """Public signatures-once seam (SimHashIndex parity): ONE
        (doc, mh_0..mh_{K-1}) DataFrame for a batch, reusable
        (localCheckpoint it) across `dedup.minhash_dropped_ids(sigs=)`,
        `screen(sigs=)`, `dedup_new(sigs=)` and `add(sigs=)` — the
        streaming text gate shingles+hashes each micro-batch exactly
        once instead of three times."""
        return minhash_signatures(docs, self.num_hashes, self.n,
                                  text_col, id_col)

    def bands_table(self) -> DataFrame:
        from pyspark.errors import AnalysisException
        from pyspark.sql import types as T

        try:
            return self.spark.read.parquet(self._table_dir("bands"))
        except AnalysisException as exc:
            # an EMPTY build's partitionBy write leaves no files at all
            # (nothing to infer a schema from) — synthesize the typed empty
            # relation so screen()/add() work on a fresh index that the
            # stream itself will populate. ONLY those two error classes
            # qualify: any other read failure (corrupt layout, lost swap)
            # must raise — an empty bands table silently disables the
            # dedup gate, which is far worse than crashing.
            if _error_condition(exc) not in (
                "PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"
            ):
                raise
            doc_t = self.signatures().schema["doc"].dataType
            return self.spark.createDataFrame([], T.StructType([
                T.StructField("doc", doc_t),
                T.StructField("band_id", T.IntegerType()),
                T.StructField("band_hash", T.StringType()),
                T.StructField("bucket", T.LongType()),
            ]))

    def _append(self, sig: DataFrame, overwrite: bool = False) -> None:
        """Bands FIRST, signatures second — deliberately. add()'s re-add
        anti-join reads {path}/signatures, and Spark invalidates cached
        plans that reference a path when that path is written; writing
        signatures first would therefore recompute `sig` for the bands
        write WITH the batch already appended, anti-join everything away,
        and silently write zero band rows. The bands path is not read by
        the plan, so its write leaves the cache intact. (Crash between the
        two appends leaves band rows whose signatures are missing: they
        can never produce a screen hit — the signature join is inner — and
        the re-add guard keys on signatures, so a retried add() re-appends
        the batch cleanly; duplicate band rows collapse in screen()'s
        dropDuplicates.)

        Layout versioning: build() targets a fresh generation-1 directory
        per table and publishes it with an atomic commit marker; add()
        appends INTO the live generation (see operators/index_maint.py —
        compaction publishes later generations the same way, so readers
        never see a half-swapped path)."""
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
        banded = banded_of(sig, self.num_hashes, self.bands).withColumn(
            "bucket", F.pmod(F.xxhash64("band_hash"), F.lit(self.n_buckets))
        )
        banded.write.mode(mode).partitionBy("bucket").parquet(bands_dest)
        sig.write.mode(mode).parquet(sigs_dest)
        if overwrite:
            commit_generation(self.spark, bands_root, 1)
            commit_generation(self.spark, sigs_root, 1)

    # ------------------------------------------------------------ increment

    def add(
        self,
        docs: DataFrame | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        assume_new: bool = False,
        sigs: DataFrame | None = None,
    ) -> int:
        """Append a batch's signatures + bands (LexicalIndex.add parity:
        anti-join re-add guard, `assume_new` escape, single-writer
        contract). Returns the number of docs added. Precomputed `sigs`
        (a `signatures_of` result) skip re-shingling `docs`.

        The default guard reads the stored id set per call — O(corpus).
        Streaming ingestion at scale should pass ``assume_new=True`` and
        delegate replay safety to `index_maint.EpochLedger` (see
        `streaming.pipeline.stream_ingest_deduped`), which pays the
        guarded anti-join only when retrying a crashed epoch."""
        sig = sigs if sigs is not None else minhash_signatures(
            docs, self.num_hashes, self.n, text_col, id_col
        )
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
        """Collapse each band bucket to one file and the signature table to
        a bounded file count after many add() appends (OPTIMIZE analogue;
        see operators/index_maint.py). Returns the signature row count.
        Single-writer contract."""
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
            # an empty build leaves no band files (see bands_table) —
            # nothing to compact; anything else must surface
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
        new_docs: DataFrame | None = None,
        threshold: float | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        sigs: DataFrame | None = None,
    ) -> DataFrame:
        """(new_id, corpus_id, est_jaccard) candidates of the new batch vs
        the INDEXED corpus. Only the batch is shingled/hashed (or not at
        all, with precomputed `sigs`); the corpus side is two reads of
        the persisted layout (bands: slim equi-join keyed exactly like
        the stored partitioning; signatures: joined on candidate ids
        only). `threshold` filters est_jaccard >= t."""
        # no cache: the returned plan is lazy, so nothing would materialize
        # it here, and a cache with no unpersist would leak one entry per
        # screen() call in a long-lived ingestion loop. The plan references
        # new_sig twice (bands + signature join) — recomputing the batch's
        # shingle pass twice inside one job is O(batch), acceptable (zero
        # with checkpointed `sigs`). A lazy localCheckpoint here was tried
        # in optimization r15 and REVERTED: hiding the batch side behind an
        # RDD scan disables the dynamic partition pruning that restricts
        # the stored bands scan to the batch's own buckets (test_plan_shapes
        # gates it on q105) — at 100 TB the pruned index scan is worth far
        # more than one batch re-hash.
        new_sig = sigs if sigs is not None else minhash_signatures(
            new_docs, self.num_hashes, self.n, text_col, id_col
        )
        new_banded = banded_of(new_sig, self.num_hashes, self.bands).withColumn(
            "bucket", F.pmod(F.xxhash64("band_hash"), F.lit(self.n_buckets))
        )
        cand = (
            new_banded.alias("x")
            .join(self.bands_table().alias("y"),
                  ["bucket", "band_id", "band_hash"])
            .select(F.col("x.doc").alias("new_id"),
                    F.col("y.doc").alias("corpus_id"))
            .dropDuplicates(["new_id", "corpus_id"])
        )
        sig_a = new_sig.select(
            F.col("doc").alias("new_id"),
            *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(self.num_hashes)],
        )
        sig_b = self.signatures().select(
            F.col("doc").alias("corpus_id"),
            *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(self.num_hashes)],
        )
        agree = sum(
            F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
            for i in range(self.num_hashes)
        )
        out = (
            cand.join(sig_a, "new_id")
            .join(sig_b, "corpus_id")
            .withColumn(
                "est_jaccard",
                F.round(agree / F.lit(float(self.num_hashes)), 6),
            )
            .select("new_id", "corpus_id", "est_jaccard")
        )
        if threshold is not None:
            out = out.filter(F.col("est_jaccard") >= threshold)
        return out

    def dedup_new(
        self,
        new_docs: DataFrame,
        threshold: float = 0.8,
        id_col: str = "doc_id",
        text_col: str = "text",
        sigs: DataFrame | None = None,
    ) -> DataFrame:
        """The ingestion gate: batch docs with NO indexed near-dup at
        est_jaccard >= threshold. Call `add` on the result to accept the
        survivors into the index. Precomputed `sigs` skip the batch
        re-hash.

        Scope: gates the batch against the CORPUS only. Near-dups WITHIN
        the batch are the one-shot problem — run
        `dedup.minhash_lsh_candidates` on the batch first (q20), or accept
        that intra-batch dups resolve on the NEXT batch's screen once the
        first copy is indexed."""
        dupes = (
            self.screen(new_docs, threshold, id_col, text_col, sigs=sigs)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        return new_docs.join(dupes, id_col, "left_anti")
