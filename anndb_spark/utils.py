"""Small shared helpers for the physical layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition degenerate low-parallelism inputs before compute-heavy
    projections.

    A small table read from one parquet file (or squeezed through
    `limit`/`cache`) arrives as ONE partition, which serializes every
    downstream expression — measured 32× on the md5-heavy MinHash
    pipeline at local[32].  At real scale the scan supplies ample
    partitions and this is a no-op; bytes are a bad proxy for
    per-row compute cost, which is why AQE/`maxPartitionBytes` don't
    cover this (same reasoning as the HNSW build's explicit
    repartition, `operators/hnsw.py`).
    """
    spark = df.sparkSession
    minp = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < minp:
        return df.repartition(minp)
    return df
