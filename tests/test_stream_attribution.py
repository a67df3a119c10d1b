"""Stream-stream interval join vs the batch range_join."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def test_stream_attribution_matches_batch_range_join(spark, tmp_path):
    from anndb_spark.operators.temporal import range_join
    from anndb_spark.sources.tables import load_events
    from anndb_spark.streaming.attribution import stream_attribution

    ev = load_events(spark, SF).filter("user_id < 12")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )

    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purchases")
    clicks.coalesce(1).write.parquet(csrc)
    purchases.coalesce(1).write.parquet(psrc)
    cs = spark.readStream.schema(spark.read.parquet(csrc).schema).parquet(csrc)
    ps = spark.readStream.schema(spark.read.parquet(psrc).schema).parquet(psrc)

    out = stream_attribution(
        cs, ps, on="ts", by="user_id", lower_seconds=0, upper_seconds=600,
        watermark_seconds=7 * 24 * 3600,  # synthetic ts span days
    )
    out_dir = str(tmp_path / "attributed")
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["click_id"], r["right_purchase_id"], r["delta_us"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["click_id"], r["right_purchase_id"], r["delta_us"])
        for r in range_join(
            clicks, purchases, on="ts", by="user_id",
            lower_seconds=0, upper_seconds=600,
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the fixture must actually exercise matches
