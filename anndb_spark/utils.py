"""Small shared helpers for the physical layer."""

from __future__ import annotations

from pyspark.sql import DataFrame


def num_partitions(df: DataFrame) -> int:
    """Physical partition count of the plan, without building the Python
    RDD.

    ``df.rdd`` plans the query AND appends a java-to-python conversion
    stage (per-row pickling serializers) just to ask for a count;
    ``queryExecution().toRdd()`` only forces physical planning — the
    lightest partition probe there is, and still no job.
    """
    return df._jdf.queryExecution().toRdd().getNumPartitions()


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition degenerate low-parallelism inputs before compute-heavy
    projections.

    A small table read from one parquet file (or squeezed through
    `limit`/`cache`) arrives as ONE partition, which serializes every
    downstream expression — measured 32× on the md5-heavy MinHash
    pipeline at local[32].  At real scale the scan supplies ample
    partitions (see ``spark.sql.files.minPartitionNum`` in session.py)
    and this is a no-op; bytes are a bad proxy for per-row compute cost,
    which is why AQE/`maxPartitionBytes` don't cover this (same
    reasoning as the HNSW build's explicit repartition,
    `operators/hnsw.py`).
    """
    spark = df.sparkSession
    minp = min_partitions or spark.sparkContext.defaultParallelism
    if num_partitions(df) < minp:
        return df.repartition(minp)
    return df
