"""Streaming sessionization (native session_window) vs the batch
temporal.sessionize operator."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from anndb_spark.session import get_spark

    return get_spark()


def _events(spark):
    from pyspark.sql import functions as F
    from anndb_spark.sources.tables import load_events

    # watermarks need TIMESTAMP (LTZ); load_events yields NTZ
    return (
        load_events(spark, SF)
        .filter("user_id < 5")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _batch_sessions(spark):
    from anndb_spark.operators.temporal import sessionize

    ev = _events(spark)
    return {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in sessionize(
            ev, gap_seconds=8 * 3600, order_cols=["event_id"], value_col="value"
        ).collect()
    }


def test_session_rollups_batch_matches_sessionize(spark):
    from anndb_spark.streaming.changelog import session_rollups

    ev = _events(spark)
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in session_rollups(ev, gap="8 hours").collect()
    }
    assert got == _batch_sessions(spark)


def test_session_rollups_streaming(spark, tmp_path):
    from anndb_spark.streaming.changelog import session_rollups

    src = str(tmp_path / "events_src")
    _events(spark).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        session_rollups(stream, gap="8 hours", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_rollups")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # complete mode re-emits the whole (finite) result, so the memory
    # table is exactly the final session set
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"],
            r["n_events"],
            r["sum_value"],
        )
        for r in spark.sql("SELECT * FROM sess_rollups").collect()
    }
    assert got == _batch_sessions(spark)
