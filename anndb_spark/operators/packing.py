"""Sequence packing: assign whole documents to fixed-token-budget
bins (best-fit-decreasing) so a pretraining loader can build
``seq_len`` sequences without splitting documents.

This is the document-integrity packing flavor; the concatenate-then-
split layout (documents split across sequence boundaries) is
``text.token_stream_offsets``, which has an exact SQL twin.  Greedy
bin packing is inherently sequential, so it runs per bucket inside
``applyInPandas`` — Arrow-batched, deterministic (sort by descending
token count, id as tie-break), with buckets packing in parallel.

Scale shape: one shuffle on the bucket key; per-bucket work is
O(n log n) comparisons plus list inserts.  A bucket must fit one
task's memory — ``sub_buckets > 1`` salts each bucket into
deterministic sub-buckets (id-hash), bounding group size at the cost
of slightly worse packing (bins never span sub-buckets).  Documents
longer than the budget get a bin of their own and ``oversize=true``
(the loader truncates or splits those explicitly).
"""

from __future__ import annotations

from bisect import bisect_left, insort

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "bucket STRING, id STRING, n_tokens BIGINT, bin_id BIGINT, "
    "bin_offset BIGINT, oversize BOOLEAN"
)


def _pack_one(pdf: pd.DataFrame, seq_len: int) -> pd.DataFrame:
    pdf = pdf.sort_values(
        ["n_tokens", "id"], ascending=[False, True], kind="mergesort"
    )
    # open bins as a sorted list of [remaining, bin_id]; best-fit =
    # smallest remaining that still fits (leftmost >= need)
    open_bins: list[list[int]] = []
    fills: dict[int, int] = {}
    next_bin = 0
    bin_ids, offsets, oversized = [], [], []
    for n in pdf["n_tokens"].to_list():
        n = int(n)
        over = n > seq_len
        if over:
            b = next_bin
            next_bin += 1
            fills[b] = n
        else:
            i = bisect_left(open_bins, [n])
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
                if rem - n > 0:
                    insort(open_bins, [rem - n, b])
            else:
                b = next_bin
                next_bin += 1
                fills[b] = 0
                if seq_len - n > 0:
                    insort(open_bins, [seq_len - n, b])
        bin_ids.append(b)
        offsets.append(fills.get(b, 0) if not over else 0)
        if not over:
            fills[b] = fills.get(b, 0) + n
        oversized.append(over)
    out = pdf.copy()
    out["bin_id"] = pd.array(bin_ids, dtype="int64")
    out["bin_offset"] = pd.array(offsets, dtype="int64")
    out["oversize"] = oversized
    return out


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str | None = "source",
    sub_buckets: int = 1,
) -> DataFrame:
    """(bucket, id, n_tokens, bin_id, bin_offset, oversize): every
    document assigned to a bin whose token total never exceeds
    ``seq_len`` (except single oversize documents).  Bin ids are
    dense per bucket; ``bin_offset`` is the document's start inside
    its bin in pack order."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    bucket = (
        F.col(bucket_col).cast("string") if bucket_col else F.lit("all")
    )
    if sub_buckets > 1:
        # pmod, not %: Spark's % keeps the dividend's sign, which would
        # split every bucket into 2·sub_buckets salts ("src#-3" and
        # "src#3") — same convention as catalog.uuid_mod
        bucket = F.concat_ws(
            "#",
            bucket,
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sub_buckets)).cast("string"),
        )
    base = df.select(
        bucket.alias("bucket"),
        F.col(id_col).cast("string").alias("id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    return base.groupBy("bucket").applyInPandas(
        lambda pdf: _pack_one(pdf, seq_len), _OUT_SCHEMA
    )


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str | None = "source",
    sub_buckets: int = 1,
) -> dict:
    """The export sink at the end of the curation pipeline: pack
    documents into ``seq_len`` bins, join the text back, and write
    parquet shards a pretraining loader can stream **sequentially** —
    directory-partitioned by bucket, rows sorted by (bin_id,
    bin_offset) inside each file so one file scan yields whole bins in
    pack order (no loader-side shuffle or sort).

    Scale shape: pack_sequences' one shuffle + an id-equi-join back to
    the text (ids-only until this join — text never rides the packing
    shuffle) + the write's own hash partitioning by bucket.  Returns a
    small manifest dict {bucket: {n_docs, n_bins, n_oversize}} and
    writes it as ``_manifest.json`` next to the shards (bucket counts
    are one tiny aggregate — driver-safe by construction).
    """
    import json
    import os

    packed = pack_sequences(
        df, seq_len, text_col=text_col, id_col=id_col,
        bucket_col=bucket_col, sub_buckets=sub_buckets,
    )
    text = df.select(
        F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
    )
    rows = packed.join(text, "id")
    (
        rows.repartition("bucket")
        .sortWithinPartitions("bucket", "bin_id", "bin_offset")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    manifest = {
        r["bucket"]: {
            "n_docs": r["n_docs"],
            "n_bins": r["n_bins"],
            "n_oversize": r["n_oversize"],
        }
        for r in packed.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            (F.max("bin_id") + 1).alias("n_bins"),
            F.sum(F.col("oversize").cast("int")).alias("n_oversize"),
        )
        .collect()
    }
    meta = {"seq_len": seq_len, "buckets": manifest}
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(meta, f)
    return meta


def read_training_shards(spark, out_dir: str) -> DataFrame:
    """Read shards back in loader order (bucket, bin_id, bin_offset are
    all in the data; parquet row order inside a file is preserved)."""
    return spark.read.parquet(out_dir)
