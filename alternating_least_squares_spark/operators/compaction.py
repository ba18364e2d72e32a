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
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024

HIVE_NULL_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def _hive_unescape(value: str) -> str:
    """Undo hive partition-path escaping (%2F etc.) so path-derived
    partition values compare equal to the column values."""
    return re.sub(
        "%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), value
    )


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


def partition_dir_stats(
    spark: SparkSession, path: str, partition_by: list[str]
) -> dict[tuple[str, ...], tuple[int, int]]:
    """Per-dynamic-partition file census, same listing as
    :func:`directory_stats`: map of (value per partition column, as the
    hive-unescaped path string) → (n_data_files, total_bytes). One
    listing round, no data read — and the global stats are just the
    sums, so callers needing both never list twice."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    root = fs.makeQualified(hpath).toString().rstrip("/")
    out: dict[tuple[str, ...], int] = {}
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        if p.getName().startswith(("_", ".")):
            continue
        rel = p.toString()[len(root) :].strip("/")
        values: dict[str, str] = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                values[k] = _hive_unescape(v)
        key = tuple(values.get(c, HIVE_NULL_PARTITION) for c in partition_by)
        n, b = out.get(key, (0, 0))
        out[key] = (n + 1, b + st.getLen())
    return out


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
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _qualified(p: str) -> str:
        hp = jvm.org.apache.hadoop.fs.Path(p)
        return hp.getFileSystem(conf).makeQualified(hp).toString().rstrip("/")

    qsrc, qdst = _qualified(src), _qualified(dst)
    if (
        qsrc == qdst
        or qdst.startswith(qsrc + "/")
        or qsrc.startswith(qdst + "/")
    ):
        # mode("overwrite") deletes dst BEFORE the lazy read of src
        # executes — in-place compaction would silently destroy the
        # table, and NESTED paths are just as fatal: dst containing
        # src recursively deletes the input at job start; src
        # containing dst intermixes output files into the source tree
        # (duplicate rows for every later reader). Require disjoint
        # paths; write to a scratch dir and swap.
        raise ValueError(
            f"compact_parquet: src ({qsrc}) and dst ({qdst}) overlap; "
            "in-place or nested compaction destroys or corrupts the "
            "input — write to a disjoint scratch dir and swap"
        )

    df: DataFrame = spark.read.parquet(src)
    if partition_by:
        # Size the salt modulus from each dynamic partition's OWN byte
        # total (census grouped by partition directory), not the global
        # one: with a global modulus a small partition's rows scatter
        # across up to n_target salts → tiny files, the exact problem
        # this operator exists to fix. The global before-stats are the
        # sums of the same census — one listing round, not two.
        per_part = partition_dir_stats(spark, src, partition_by)
        n_before = sum(n for n, _ in per_part.values())
        total = sum(b for _, b in per_part.values())
        n_target = target_file_count(total, target_file_bytes)
        moduli = [
            (*key, target_file_count(bytes_, target_file_bytes))
            for key, (_, bytes_) in per_part.items()
        ]
        mod_df = spark.createDataFrame(
            moduli, [f"__pv_{c}" for c in partition_by] + ["__mod"]
        )
        key_exprs = [
            F.coalesce(F.col(c).cast("string"), F.lit(HIVE_NULL_PARTITION))
            == F.col(f"__pv_{c}")
            for c in partition_by
        ]
        cond = key_exprs[0]
        for e in key_exprs[1:]:
            cond = cond & e
        salt = F.pmod(
            F.crc32(F.concat_ws("\x00", *df.columns)),
            # a partition born between census and read falls back to
            # the global modulus rather than failing the job
            F.coalesce(F.col("__mod"), F.lit(n_target)),
        ).alias("_salt")
        # Explicit shuffle-partition count: without it AQE coalesces
        # the (small) shuffle to one task, which writes ONE file per
        # dynamic partition regardless of salt. 2× the planned total
        # keeps hash collisions from merging too many salts; per
        # dynamic partition the file count is ≤ its own modulus
        # (collisions only merge, never split). A petabyte-class
        # deployment would bin-pack the file census driver-side
        # (Delta/Iceberg OPTIMIZE style) instead of shuffling rows.
        total_planned = max(sum(m[-1] for m in moduli), 1)
        (
            df.join(F.broadcast(mod_df), cond, "left")
            .withColumn("_salt", salt)
            .repartition(
                2 * total_planned,
                *[F.col(c) for c in partition_by],
                F.col("_salt"),
            )
            .drop("_salt", "__mod", *[f"__pv_{c}" for c in partition_by])
            .write.partitionBy(*partition_by)
            .mode("overwrite")
            .parquet(dst)
        )
    else:
        n_before, total = directory_stats(spark, src)
        n_target = target_file_count(total, target_file_bytes)
        df.repartition(n_target).write.mode("overwrite").parquet(dst)
    n_after, total_after = directory_stats(spark, dst)
    return {
        "files_before": n_before,
        "bytes_before": total,
        "files_planned": n_target,
        "files_after": n_after,
        "bytes_after": total_after,
    }
