"""Multimodal columns — images/audio/video as opaque BINARY + typed
metadata, with decode / feature-extraction / resize / frame-sampling as
Arrow-batched ``mapInPandas`` pipelines (north-star extension).

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec step is STUBBED because
image/audio libraries are not available in this environment:

- ``codec='real'`` raises NotImplementedError unless PIL/soundfile are
  importable (they are not here) — the seam where a production deploy
  plugs in the real decoder.
- ``codec='fake'`` (default) derives deterministic pseudo-pixels /
  pseudo-frames from the content hash, so every downstream operator
  (feature kNN, near-dup, resize bookkeeping) is fully exercisable.

At 100 TB: media rows are large — the module keeps bytes in a single
BINARY column (parquet keeps it out of unrelated scans via column
pruning), partitions by media_id hash so one Arrow batch holds a
bounded byte volume, and feature extraction emits small fixed-width
vectors that flow into the vector core (knn/dedup) without reshuffling
the raw bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _require_real_codec(kind: str):
    try:
        if kind == "image":
            import PIL  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
        else:
            raise ImportError("no video codec available")
    except ImportError as e:
        raise NotImplementedError(
            f"real {kind} codec not available in this environment; "
            f"use codec='fake' or install the decoder"
        ) from e


def _fake_pixels(content: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-decode: expand the content digest into n
    float32 values in [0, 1).  Hashing stays in the hex-STRING domain
    (md5(hex_digest || str(counter))) so the fake decode is replayable
    in ANSI SQL — the driver oracle reproduces the whole feature
    pipeline bit-exactly (k/256 float32 values format identically in
    Spark and DuckDB, verified for all 256 byte values)."""
    out = np.empty(n, dtype=np.float32)
    hhex = hashlib.md5(content).hexdigest()
    filled = 0
    counter = 0
    while filled < n:
        block = np.frombuffer(
            hashlib.md5((hhex + str(counter)).encode()).digest(),
            dtype=np.uint8,
        ).astype(np.float32) / 256.0
        take = min(len(block), n - filled)
        out[filled : filled + take] = block[:take]
        filled += take
        counter += 1
    return out


def extract_features(
    media: DataFrame,
    dim: int = 64,
    codec: str = "fake",
    partitions: int | None = None,
) -> DataFrame:
    """(media_id, kind, feature ARRAY<FLOAT>) — the embedding column that
    feeds the vector core.  Hash-partitioned so batches are balanced."""
    if codec == "real":
        _require_real_codec("image")

    if partitions:
        media = media.repartition(partitions, F.xxhash64("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_pixels(bytes(c), dim).tolist() for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(
        run, schema="media_id STRING, kind STRING, feature ARRAY<FLOAT>"
    )


def resize_images(
    media: DataFrame, width: int, height: int, codec: str = "fake"
) -> DataFrame:
    """Resize bookkeeping: emits content (stub: digest-derived bytes of the
    target size class) + updated meta width/height."""
    if codec == "real":
        _require_real_codec("image")
    nbytes = min(width * height, 4096)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["content"] = [
                (_fake_pixels(bytes(c), nbytes) * 255).astype(np.uint8).tobytes()
                for c in pdf["content"]
            ]
            out["meta"] = [
                {**(m or {}), "width": str(width), "height": str(height)}
                for m in pdf["meta"]
            ]
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, codec: str = "fake"
) -> DataFrame:
    """Video → frame rows (media_id, frame_no, frame BINARY).  The stub
    derives a deterministic frame count from the content length."""
    if codec == "real":
        _require_real_codec("video")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                if t.kind != "video":
                    continue
                content = bytes(t.content)
                n_frames = max(1, len(content) // 64)
                for f in range(0, n_frames, every_n):
                    frame = hashlib.md5(
                        content + f.to_bytes(4, "big")
                    ).digest()
                    rows.append((t.media_id, f, frame))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "frame"]
            )

    return media.mapInPandas(
        run, schema="media_id STRING, frame_no INT, frame BINARY"
    )


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Synthetic media table from the documents fixture (text bytes as
    opaque content) — lets every multimodal operator run on shared
    testdata without real media files."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("meta"),
    )
