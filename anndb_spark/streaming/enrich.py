"""Streaming point-in-time enrichment: as-of join each micro-batch of
an event stream against a snapshot dimension table.

Window functions are unsupported on streaming DataFrames, so the
union-trick as-of (`operators.temporal.asof_join`) cannot run
in-stream; the standard shape is ``foreachBatch`` — each micro-batch
is a bounded DataFrame, so the one-shuffle batch operator applies
verbatim.  Output goes to ``out_dir/batch=<id>`` with per-batch
overwrite, which makes replays idempotent (a retried batch rewrites
its own directory instead of appending duplicates) and lets readers
treat ``batch`` as an ordinary partition column.

Scale contract: the dimension side is a SNAPSHOT (features valid as
of job start) — the right model for slowly-changing dimensions.  A
dimension that itself streams needs event-time buffering state that
Spark's stream-stream joins provide for equality predicates only;
re-snapshot per trigger via ``foreachBatch`` re-reading the dimension
path if freshness matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_enrich_asof(
    stream: DataFrame,
    right: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    on: str = "ts",
    by: str | list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    trigger_available_now: bool = True,
):
    """Start the enrichment stream; returns the StreamingQuery.
    Results land under ``out_dir/batch=<batch_id>/`` as parquet."""
    from anndb_spark.operators.temporal import asof_join

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            right,
            on=on,
            by=by,
            direction=direction,
            tolerance_seconds=tolerance_seconds,
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
