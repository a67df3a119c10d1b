"""Streaming as-of enrichment vs the batch operator."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def test_stream_enrich_asof_matches_batch(spark, tmp_path):
    from anndb_spark.operators.temporal import asof_join
    from anndb_spark.sources.tables import load_events
    from anndb_spark.streaming.enrich import stream_enrich_asof

    ev = load_events(spark, SF).filter("user_id < 8")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )

    src = str(tmp_path / "purchases_src")
    purchases.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)

    out_dir = str(tmp_path / "enriched")
    q = stream_enrich_asof(
        stream,
        clicks,
        out_dir,
        str(tmp_path / "ckpt"),
        on="ts",
        by="user_id",
    )
    q.awaitTermination(180)

    got = {
        r["event_id"]: (r["right_ts"], r["right_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        r["event_id"]: (r["right_ts"], r["right_value"])
        for r in asof_join(
            purchases, clicks, on="ts", by="user_id"
        ).collect()
    }
    assert got == exp and len(got) > 0
