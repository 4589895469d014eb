"""Entity-table storage: the Postgres schema re-expressed as partitioned
parquet with upsert/cascade/idempotent-reingest semantics.

Mapping from the reference's storage layer:

- expression BTREEs on view/lang (storage/schema.py:93-118)  →  embeddings
  written `partitionBy("view", "lang")`: an equality filter on either is
  partition pruning (directories skipped, not rows filtered).
- `ON CONFLICT (key) DO UPDATE` upserts (parent_store.py:47-54,
  app/storage.py:327-438)  →  `upsert_by_key`: anti-join out the incoming
  keys, union, rewrite — last-writer-wins, exactly the reference's merge
  semantics. On a lakehouse table format (Delta/Iceberg, jars not present
  here) the same call becomes MERGE INTO without a full rewrite.
- re-ingest idempotency (api/use_cases/ingest.py:147-160)  →
  `overwrite_document`: dynamic partition overwrite of one document_id.
- cascade delete (storage/cascade.py:83-151)  →  operators/cascade.py
  anti-joins, persisted here by rewriting each level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EntityStore:
    """Parquet-backed store for documents/concepts/fragments/embeddings/parents."""

    PARTITIONING: dict[str, list[str]] = {
        "embeddings": ["view"],
        "fragments": ["document_id"],
        "concepts": ["document_id"],
    }

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir

    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table))

    def write(self, table: str, df: DataFrame, mode: str = "overwrite") -> None:
        writer = df.write.mode(mode)
        parts = self.PARTITIONING.get(table)
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(self.path(table))
        self._save_schema(table, df)

    def read(self, table: str) -> DataFrame:
        # a fully-deleted table has no parquet footers to infer from — fall
        # back to the schema persisted at write time
        schema = self._load_schema(table)
        if schema is not None:
            return self.spark.read.schema(schema).parquet(self.path(table))
        return self.spark.read.parquet(self.path(table))

    def _schema_path(self, table: str) -> str:
        return self.path(table) + ".schema.json"

    def _save_schema(self, table: str, df: DataFrame) -> None:
        import json

        with open(self._schema_path(table), "w") as fh:
            fh.write(json.dumps(df.schema.jsonValue()))

    def _load_schema(self, table: str):
        import json

        from pyspark.sql import types as T

        p = self._schema_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return T.StructType.fromJson(json.loads(fh.read()))

    # ------------------------------------------------------------- upserts

    def upsert_by_key(self, table: str, incoming: DataFrame, key: str) -> None:
        """Last-writer-wins merge on `key` (the ON CONFLICT DO UPDATE
        analogue). Incoming duplicates collapse to one row per key first."""
        incoming = incoming.dropDuplicates([key])
        if self.exists(table):
            existing = self.read(table)
            survivors = existing.join(
                F.broadcast(incoming.select(key)), key, "left_anti"
            )
            merged = survivors.unionByName(incoming)
        else:
            merged = incoming
        # write through a temp dir: the plan reads the same files it replaces
        tmp = self.path(table) + "__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.path(table)
        self._swap(tmp, final)
        self._save_schema(table, merged)

    def insert_if_absent(self, table: str, incoming: DataFrame, keys: list[str]) -> None:
        """`ON CONFLICT DO NOTHING` over a composite key — the custom
        child_chunks dedupe index (storage/schema.py:192-195): keep existing
        rows, append only unseen keys."""
        incoming = incoming.dropDuplicates(keys)
        if self.exists(table):
            existing_keys = self.read(table).select(*keys)
            fresh = incoming.join(existing_keys, keys, "left_anti")
            fresh.write.mode("append").parquet(self.path(table))
            self._save_schema(table, incoming)
        else:
            incoming.write.mode("overwrite").parquet(self.path(table))
            self._save_schema(table, incoming)

    # -------------------------------------------------- re-ingest / cascade

    def overwrite_document(self, table: str, document_id: str, rows: DataFrame) -> None:
        """Idempotent re-ingest for document-partitioned tables: replace
        exactly one document's partition."""
        assert "document_id" in self.PARTITIONING.get(table, []), (
            f"{table} is not partitioned by document_id"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        rows.filter(F.col("document_id") == document_id).write.mode(
            "overwrite"
        ).partitionBy("document_id").parquet(self.path(table))

    def cascade_delete(self, doc_ids: list[str]) -> dict[str, int]:
        """Delete document trees child-first (CASCADE-001..004); returns
        per-table surviving row counts."""
        from ocr_vector_db_spark.operators.cascade import cascade_delete

        doomed = self.spark.createDataFrame([(d,) for d in doc_ids], ["id"])
        survivors = cascade_delete(
            self.read("documents"),
            self.read("concepts"),
            self.read("fragments"),
            self.read("embeddings").withColumnRenamed("parent_id", "__pid").withColumn(
                "parent_id", F.col("__pid")
            ).drop("__pid"),
            doomed,
        )
        counts = {}
        for table in ("embeddings", "fragments", "concepts", "documents"):  # child-first
            df = survivors[table]
            tmp = self.path(table) + "__tmp"
            writer = df.write.mode("overwrite")
            parts = self.PARTITIONING.get(table)
            if parts:
                writer = writer.partitionBy(*parts)
            writer.parquet(tmp)
            self._swap(tmp, self.path(table))
            self._save_schema(table, df)
            counts[table] = self.read(table).count()
        return counts

    @staticmethod
    def _swap(tmp: str, final: str) -> None:
        import shutil

        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    # ----------------------------------------------------------- lifecycle

    def save_ingest(self, out: dict[str, DataFrame]) -> None:
        """Persist a full ingest result (documents/concepts/fragments/
        embeddings/parents)."""
        for table in ("documents", "concepts", "fragments", "embeddings"):
            self.write(table, out[table])
        self.upsert_by_key("parents", out["parents"], "id")

    def compact(self, table: str, target_partitions: int) -> None:
        """OPTIMIZE analogue: rewrite a table at a chosen file granularity
        (small-file compaction after many incremental appends)."""
        df = self.read(table).coalesce(target_partitions)
        tmp = self.path(table) + "__tmp"
        df.write.mode("overwrite").parquet(tmp)
        self._swap(tmp, self.path(table))
