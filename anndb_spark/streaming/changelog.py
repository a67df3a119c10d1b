"""Structured-Streaming incremental maintenance — the streaming analogue
of the reference's Raft apply loop.

The reference applies committed ``PartitionChange`` entries to the live
index as they arrive (`storage/partition.go:435-474`,
`storage/raft/group.go:179-236`) and snapshots every 5000 entries
(`storage/raft/group.go:18,275-300`).  The Spark-native equivalent:

- the changelog is an append-only parquet directory consumed with
  ``readStream`` (exactly-once via the checkpoint, which replaces the
  Raft hard-state),
- every micro-batch folds new changes into the base snapshot with the
  same ``apply_changes`` state machine used in batch (one semantics,
  two execution modes),
- windowed/watermarked aggregation over the events stream shows the
  standard watermark pattern for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anndb_spark.operators.crud import apply_changes_sql, split_state

CHANGES_DDL = (
    "seq LONG, id STRING, op STRING, vector ARRAY<DOUBLE>, "
    "metadata MAP<STRING,STRING>"
)


def stream_apply_changes(
    spark: SparkSession,
    changelog_dir: str,
    base_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Continuously compact a growing parquet changelog into the base
    snapshot.  Returns the StreamingQuery.

    Each micro-batch replays ONLY new files (Spark file-source tracking),
    folds them into the current snapshot, and atomically rewrites it —
    the micro-batch is the reference's snapshotOffset window.
    """
    stream = (
        spark.readStream.schema(CHANGES_DDL).parquet(changelog_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int):
        spark_l = batch_df.sparkSession
        try:
            base = spark_l.read.parquet(base_dir)
        except Exception:
            base = None
        new_state = split_state(apply_changes_sql(base, batch_df)).localCheckpoint()
        new_state.write.mode("overwrite").parquet(base_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a (streaming or
    batch) events DataFrame: (window, event_type, n_events, sum_value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
