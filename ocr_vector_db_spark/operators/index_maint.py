"""Maintenance shared by the persisted indexes (lexical / IVF / MinHash).

Every incremental `add()` appends files into the partitioned layouts, so a
long-lived index accumulates one small parquet file per (add, partition) —
the classic small-files problem. `compact_partitioned` is the OPTIMIZE
analogue (EntityStore.compact for partitioned index layouts): rewrite the
table hash-repartitioned BY its partition column, so each partition
directory collapses to one file, then swap directories.

The swap goes through the Hadoop FileSystem API (works on local/HDFS;
object-store rename is copy+delete) and follows the `_commit_stats`
ordering: the old directory is renamed aside — never deleted — before the
new one moves in, so every crash point leaves a complete copy on disk
(`{path}` or `{path}__old`; `swap_dir` self-heals the latter on the next
call). The swap is crash-RECOVERABLE, not atomic: a reader hitting the
window between the two renames sees a missing path until the next
maintenance call. Single-writer contract, same as the indexes' add()."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def swap_dir(spark: SparkSession, tmp: str, final: str) -> None:
    """Replace directory `final` with `tmp` via rename-aside:

      0. if `final` is missing but `final__old` exists (a prior swap died
         mid-flight), restore it first — self-healing;
      1. rename `final` → `final__old`   (crash → old copy recoverable)
      2. rename `tmp` → `final`          (crash → old copy recoverable)
      3. delete `final__old`

    Hadoop FileSystem signals most failures by RETURNING false rather than
    throwing — every rename/delete return is checked and raised on, so a
    failed step can never masquerade as a successful compaction."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(final).getFileSystem(spark._jsc.hadoopConfiguration())
    old = final + "__old"
    recover_dir(spark, final)
    if fs.exists(hpath(old)):
        if not fs.delete(hpath(old), True):  # stale — `final` exists
            raise IOError(f"delete of stale {old} failed")
    if fs.exists(hpath(final)):
        if not fs.rename(hpath(final), hpath(old)):
            raise IOError(f"rename {final} -> {old} failed")
    if not fs.rename(hpath(tmp), hpath(final)):
        raise IOError(
            f"rename {tmp} -> {final} failed; previous data is at {old}"
        )
    if fs.exists(hpath(old)) and not fs.delete(hpath(old), True):
        raise IOError(f"cleanup delete of {old} failed")


def recover_dir(spark: SparkSession, final: str) -> None:
    """Step 0 of the swap discipline: if `final` is missing but
    `final__old` exists (a prior swap died between its two renames),
    restore the old copy. Runs before every read in the compact path and
    at the start of swap_dir — a crashed maintenance pass self-heals on
    the next one."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(final).getFileSystem(spark._jsc.hadoopConfiguration())
    old = final + "__old"
    if not fs.exists(hpath(final)) and fs.exists(hpath(old)):
        if not fs.rename(hpath(old), hpath(final)):
            raise IOError(f"recovery rename {old} -> {final} failed")


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
    recover_dir(spark, path)
    df = spark.read.parquet(path).repartition(num_partitions, partition_col)
    tmp = path + "__compact"
    df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
    n = spark.read.parquet(tmp).count()
    swap_dir(spark, tmp, path)
    return n


def compact_plain(spark: SparkSession, path: str, num_files: int = 1) -> int:
    """Rewrite an unpartitioned parquet dir at `num_files` granularity."""
    recover_dir(spark, path)
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
