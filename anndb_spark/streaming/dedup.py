"""Streaming exactly-once repair: watermarked stream deduplication.

At-least-once delivery (Kafka redeliveries, file-source replays, Raft
re-applies — the reference replays committed changelog entries on
restart, `storage/raft/group.go:179-236`, and relies on idempotent
apply for correctness) means duplicate records ARE the normal case at
ingestion.  The Spark-native repair is ``dropDuplicatesWithinWatermark``:
the state store keeps one entry per key only until the watermark passes
it, so state is bounded by (event rate × watermark horizon) — never by
stream length, which is what makes this the 100 TB-safe form (plain
``dropDuplicates`` on an unbounded stream grows state forever).

Emission is row-wise (first occurrence wins, duplicates within the
watermark are suppressed), so append mode needs no closed windows and
downstream aggregations see an exactly-once event feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """First-occurrence-wins key dedup over a watermarked stream.

    ``keys`` identify a logical record (redelivered copies carry the
    same key and identical payload, so WHICH copy survives is
    immaterial to any downstream result).  State per key is dropped
    once the watermark passes its event time + horizon."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
