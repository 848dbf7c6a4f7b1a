"""Stream-stream interval join: purchases stream joined to views stream
within a time bound, both sides watermarked — the fully-streaming form
of the as-of/enrichment pattern (completes the §2.9 join story)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.tables import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ssj_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_interval_join(spark, sf_dir, tmpdir):
    events = load_table(spark, sf_dir, "events")
    events.write.mode("overwrite").json(f"{tmpdir}/in")
    events_json = spark.read.schema(events.schema).json(f"{tmpdir}/in")

    def split(df):
        p = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_uid"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        v = df.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_uid"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        return p, v

    cond = "p_uid = v_uid AND v_ts BETWEEN p_ts - INTERVAL 2 HOURS AND p_ts"

    # batch twin on identical input
    bp, bv = split(events_json)
    want = {
        (r["p_id"], r["v_id"])
        for r in bp.join(bv, F.expr(cond)).select("p_id", "v_id").collect()
    }

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 8)
        .json(f"{tmpdir}/in")
    )
    sp, sv = split(stream)
    joined = (
        sp.withWatermark("p_ts", "1 hour")
        .join(sv.withWatermark("v_ts", "1 hour"), F.expr(cond))
        .select("p_id", "v_id")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", f"{tmpdir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["p_id"], r["v_id"]) for r in spark.sql("SELECT * FROM ssj").collect()
    }
    assert got == want and len(want) > 0