"""Streaming runtime tests: the same CDC algebra under readStream must
produce the batch-path snapshot (batch/stream parity), survive replay,
and support windowed counts + peek."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.cdc import (
    generate_envelope_log,
    latest_snapshot,
    unwrap,
)
from aiven_challenge2_cdc_sharing_spark.streaming import (
    read_snapshot,
    envelope_file_stream,
    peek_one,
    run_snapshot_maintenance,
    windowed_counts,
)
from aiven_challenge2_cdc_sharing_spark.tables import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_event_json(spark, sf_dir, out_dir, partitions=6):
    log = generate_envelope_log(spark, sf_dir)
    log.repartition(partitions).write.mode("overwrite").json(out_dir)
    return log


def rows_set(df):
    return {tuple(str(x) for x in r) for r in df.select(*sorted(df.columns)).collect()}


def test_stream_snapshot_equals_batch(spark, sf_dir, tmpdir):
    events_dir = f"{tmpdir}/events"
    log = _write_event_json(spark, sf_dir, events_dir)
    expected = latest_snapshot(unwrap(log))

    stream = envelope_file_stream(spark, events_dir)
    assert stream.isStreaming
    q = run_snapshot_maintenance(
        stream, f"{tmpdir}/snapshot", f"{tmpdir}/ckpt"
    )
    q.awaitTermination(300)
    got = read_snapshot(spark, f"{tmpdir}/snapshot")
    assert rows_set(got) == rows_set(expected)


def test_stream_restart_is_idempotent(spark, sf_dir, tmpdir):
    events_dir = f"{tmpdir}/events"
    log = _write_event_json(spark, sf_dir, events_dir)
    expected = latest_snapshot(unwrap(log))

    for _ in range(2):  # second run: checkpoint says nothing new; state intact
        q = run_snapshot_maintenance(
            envelope_file_stream(spark, events_dir),
            f"{tmpdir}/snapshot",
            f"{tmpdir}/ckpt",
        )
        q.awaitTermination(300)
    got = read_snapshot(spark, f"{tmpdir}/snapshot")
    assert rows_set(got) == rows_set(expected)


def test_stream_windowed_counts_match_batch(spark, sf_dir, tmpdir):
    events = load_table(spark, sf_dir, "events")
    events_dir = f"{tmpdir}/ev_json"
    events.write.mode("overwrite").json(events_dir)

    batch_result = windowed_counts(events, window="1 hour")

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 8)
        .json(events_dir)
    )
    q = (
        windowed_counts(stream, window="1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", f"{tmpdir}/win_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT win.start AS s, win.end AS e, cnt FROM win_counts")
    want = batch_result.select(
        F.col("win.start").alias("s"), F.col("win.end").alias("e"), "cnt"
    )
    assert rows_set(got) == rows_set(want)


def test_peek_one(spark, sf_dir, tmpdir):
    events_dir = f"{tmpdir}/events"
    _write_event_json(spark, sf_dir, events_dir)
    rows = peek_one(spark, events_dir, f"{tmpdir}/peek_ckpt")
    assert len(rows) == 1
    assert rows[0]["op"] in {"c", "u", "d"}
