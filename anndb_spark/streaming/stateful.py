"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only stateful stream is the Raft apply loop folding
changelog entries into live per-partition state
(`/root/reference/storage/partition.go:435-474`).  Structured Streaming
generalizes that shape: keyed state in the state store (checkpointed —
the Raft hard-state analogue), arbitrary per-group update logic in an
Arrow-batched pandas function.

``stream_dedup_first_seen`` is the LLM-pipeline workhorse built on it:
exactly-once corpus dedup over an unbounded document stream.  Keys
(content fingerprints) shuffle to a stable owner task; each owner keeps
{first_id, n_seen} per key.  Only the first occurrence is emitted —
later duplicates just bump the state counter.  At 100 TB the state is
one small tuple per *unique* key, sharded across executors by the
hash shuffle, and RocksDB-backed state stores keep it off-heap.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fingerprint STRING, first_id STRING, n_seen_batch LONG"
STATE_SCHEMA = "first_id STRING, n_seen LONG"


def stream_dedup_first_seen(
    stream: DataFrame,
    key_col: str = "fingerprint",
    id_col: str = "doc_id",
) -> DataFrame:
    """Emit each fingerprint once — on first sight — across micro-batches.

    Input: a streaming DataFrame with ``key_col`` and ``id_col``.
    Output (append): (fingerprint, first_id, n_seen_batch) — one row per
    *newly seen* key; n_seen_batch counts occurrences within the batch
    that first saw it (immediate duplicates).  Re-sightings in later
    batches update state (n_seen) but emit nothing, so downstream sinks
    receive an exactly-once unique stream.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n_new = 0
        first_id = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_new += len(pdf)
            batch_min = pdf[id_col].astype(str).min()
            if first_id is None or batch_min < first_id:
                first_id = batch_min
        if state.exists:
            prev_first, prev_seen = state.get
            state.update((prev_first, int(prev_seen) + n_new))
            return  # already emitted on first sight
        state.update((first_id, n_new))
        yield pd.DataFrame(
            {"fingerprint": [key[0]], "first_id": [first_id], "n_seen_batch": [n_new]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
