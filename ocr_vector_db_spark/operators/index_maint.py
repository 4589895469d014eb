"""Maintenance shared by the persisted indexes (lexical / IVF / MinHash).

Every incremental `add()` appends files into the partitioned layouts, so a
long-lived index accumulates one small parquet file per (add, partition) —
the classic small-files problem. `compact_partitioned` is the OPTIMIZE
analogue (EntityStore.compact for partitioned index layouts): rewrite the
table hash-repartitioned BY its partition column, so each partition
directory collapses to one file, then atomically swap directories.

The swap goes through the Hadoop FileSystem API (works on local/HDFS;
object-store rename is copy+delete). Single-writer contract, same as the
indexes' add()."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def swap_dir(spark: SparkSession, tmp: str, final: str) -> None:
    """Replace directory `final` with `tmp` (delete-then-rename)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(final).getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath(final)):
        fs.delete(hpath(final), True)
    fs.rename(hpath(tmp), hpath(final))


def compact_partitioned(
    spark: SparkSession,
    path: str,
    partition_col: str,
    num_partitions: int,
) -> int:
    """Rewrite a partitioned parquet dir so each partition directory holds
    ONE file (hash repartition by the partition column guarantees every
    partition value lands in exactly one task). Returns the row count
    (materialized pre-swap, so a failed rewrite leaves the original)."""
    df = spark.read.parquet(path).repartition(num_partitions, partition_col)
    tmp = path + "__compact"
    df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    n = spark.read.parquet(tmp).count()
    swap_dir(spark, tmp, path)
    return n


def compact_plain(spark: SparkSession, path: str, num_files: int = 1) -> int:
    """Rewrite an unpartitioned parquet dir at `num_files` granularity."""
    df = spark.read.parquet(path).coalesce(num_files)
    tmp = path + "__compact"
    df.write.mode("overwrite").parquet(tmp)
    n = spark.read.parquet(tmp).count()
    swap_dir(spark, tmp, path)
    return n


def parquet_file_count(path: str) -> int:
    """Number of data files under a (possibly partitioned) parquet dir —
    local-fs helper for tests and maintenance reporting."""
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(1 for f in files
                     if f.endswith(".parquet") and not f.startswith("."))
    return total
