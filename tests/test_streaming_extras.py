"""Streaming-native session windows (T6) and streaming exact dedup
(watermarked dropDuplicates) — the streaming halves of operators whose
batch twins are oracle-checked."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.tables import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="se_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_session_windows_match_batch(spark, sf_dir, tmpdir):
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").json(f"{tmpdir}/in")
    # batch twin reads the same JSON files (JSON serializes timestamps
    # at millisecond precision; parquet carries micros)
    events_json = spark.read.schema(events.schema).json(f"{tmpdir}/in")

    batch = (
        events_json.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("user_id", F.col("sw.start").alias("s"), "cnt")
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 8)
        .json(f"{tmpdir}/in")
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], str(r["s"]), r["cnt"])
        for r in spark.sql(
            "SELECT user_id, sw.start AS s, cnt FROM sess"
        ).collect()
    }
    want = {(r["user_id"], str(r["s"]), r["cnt"]) for r in batch.collect()}
    assert got == want


def test_streaming_dedup_drop_duplicates(spark, sf_dir, tmpdir):
    """Exact dedup on a stream: dropDuplicates keyed by event_id with a
    watermark bounds state; replayed rows are emitted once."""
    events = load_table(spark, sf_dir, "events").limit(200)
    doubled = events.unionByName(events)  # at-least-once delivery
    doubled.write.mode("overwrite").json(f"{tmpdir}/in")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 8)
        .json(f"{tmpdir}/in")
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == 200