"""Input-width gate shared by the compute-heavy narrow passes.

A small parquet source arrives as ONE input split, which would
serialize a compute-heavy narrow pass (MinHash signatures, LSH
bucket projections) on a single core. At real scale the scan already
has thousands of splits, so an unconditional ``repartition`` would be
a pointless full shuffle of the payload — and would *coalesce* a wide
scan down to cluster parallelism. The gate repartitions only when the
input is genuinely narrower than the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_if_narrow(df: DataFrame, *key_cols: str) -> DataFrame:
    """Return ``df`` unchanged (same object — no plan change) when it
    already has at least ``defaultParallelism`` partitions; otherwise
    repartition to that width, by ``key_cols`` when given (keeps the
    downstream shuffle key) else round-robin.

    The partition-count probe reads the RDD's metadata only — the
    conversion is lazy, nothing executes.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_parts:
        cols = [df[c] for c in key_cols]
        df = df.repartition(n_parts, *cols) if cols else df.repartition(n_parts)
    return df
