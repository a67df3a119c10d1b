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


def stream_neardup(
    stream: DataFrame,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Continuous-ingest NEAR-duplicate screening: every micro-batch of
    incoming documents is checked against the existing corpus with
    MinHash-LSH (`operators.dedup.minhash_incremental_pairs`) — the
    streaming form of the batch incremental check, i.e. the shape a
    training pipeline actually runs: docs arrive continuously, the
    corpus was deduped when ingested, and only new×corpus collisions
    need work.

    Band joins and jaccard verification are batch operators, so the
    standard ``foreachBatch`` bridge applies (same reasoning as
    `enrich.stream_enrich_asof`: the per-batch DataFrame is bounded).
    Output lands under ``out_dir/batch=<id>/`` with per-batch
    overwrite — idempotent on replay.

    Scale contract: the corpus LSH state (shingles + band table) is
    computed ONCE here and persisted across batches — per batch the
    corpus side is a cached ids+vals scan, and work is O(batch bands +
    collisions).  At real scale the state would be parquet written at
    ingest time (`minhash_banded` output); memory-persisting it is the
    local-mode convenience.  Returns the StreamingQuery.
    """
    from anndb_spark.operators.dedup import (
        minhash_banded,
        minhash_incremental_pairs,
    )

    sh, bd = minhash_banded(corpus, text_col=text_col, id_col=id_col)
    state = (sh.persist(), bd.persist())

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        pairs = minhash_incremental_pairs(
            batch_df,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            corpus_state=state,
        )
        pairs.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
