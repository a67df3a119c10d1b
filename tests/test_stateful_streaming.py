"""applyInPandasWithState streaming dedup: first-seen emit, cross-batch
state survival via the checkpoint (the Raft hard-state analogue)."""

import pytest
from pyspark.sql import functions as F

from anndb_spark.streaming.stateful import stream_dedup_first_seen

DOCS_DDL = "doc_id STRING, fingerprint STRING"


def _run_batch(spark, src_dir, ckpt, out_dir):
    stream = spark.readStream.schema(DOCS_DDL).parquet(src_dir)
    q = (
        stream_dedup_first_seen(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_dedup_first_seen(spark, tmp_path):
    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.createDataFrame(
        [("d1", "fp_a"), ("d2", "fp_a"), ("d3", "fp_b")], DOCS_DDL
    ).write.mode("append").parquet(src)
    _run_batch(spark, src, ckpt, out)

    got = {r["fingerprint"]: (r["first_id"], r["n_seen_batch"])
           for r in spark.read.parquet(out).collect()}
    # fp_a seen twice in the first batch → one emit with min id, count 2
    assert got == {"fp_a": ("d1", 2), "fp_b": ("d3", 1)}

    # second increment: a re-sighting of fp_a must NOT re-emit; fp_c is new
    spark.createDataFrame(
        [("d4", "fp_a"), ("d5", "fp_c")], DOCS_DDL
    ).write.mode("append").parquet(src)
    _run_batch(spark, src, ckpt, out)

    rows = spark.read.parquet(out).collect()
    got2 = {r["fingerprint"]: (r["first_id"], r["n_seen_batch"]) for r in rows}
    assert got2 == {
        "fp_a": ("d1", 2),
        "fp_b": ("d3", 1),
        "fp_c": ("d5", 1),
    }
    assert len(rows) == 3  # exactly one row per unique fingerprint
