"""Streaming sessionizer parity: closed sessions + latest open
emission per user must equal the batch 30-min-gap sessionization, and
the peak-concurrency sweep over them must equal the batch twin —
across >= 3 micro-batches."""

from __future__ import annotations

import glob
import os
import shutil
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.streaming import (
    streaming_sessionize,
)
from aiven_challenge2_cdc_sharing_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _batch_sessions(spark):
    """The batch twins' sessionization, second-truncated bounds."""
    ev = load_table(spark, SF_DIR, "events")
    wm = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marks = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(wm).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(wm))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
        "event_id",
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        marks.withColumn("sid", F.sum("new_session").over(ws))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("s_sec"),
            F.unix_timestamp(F.max("ts")).alias("e_sec"),
        )
        .drop("sid")
    )


def test_streaming_sessions_match_batch(spark, tmpdir):
    events = load_table(spark, SF_DIR, "events")
    t1, t2 = (
        events.selectExpr(
            "percentile_approx(ts, 0.33) p1",
            "percentile_approx(ts, 0.66) p2",
        ).collect()[0]
    )
    parts = [
        events.filter(F.col("ts") <= F.lit(t1)),
        events.filter(
            (F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))
        ),
        events.filter(F.col("ts") > F.lit(t2)),
    ]
    os.makedirs(f"{tmpdir}/in")
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").json(f"{tmpdir}/src_{i}")
        f = glob.glob(f"{tmpdir}/src_{i}/part-*.json")[0]
        shutil.copy(f, f"{tmpdir}/in/{i:02d}.json")
        os.utime(f"{tmpdir}/in/{i:02d}.json", (time.time() + i * 10,) * 2)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{tmpdir}/in")
    )
    closed: list[tuple] = []
    latest_open: dict[int, tuple] = {}

    def capture(batch_df, batch_id):
        for r in batch_df.collect():
            if r["closed"]:
                closed.append((r["user_id"], r["s_sec"], r["e_sec"]))
            else:
                latest_open[r["user_id"]] = (r["s_sec"], r["e_sec"])

    q = (
        streaming_sessionize(stream)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        closed + [(u, s, e) for u, (s, e) in latest_open.items()]
    )
    expected = sorted(
        (r["user_id"], r["s_sec"], r["e_sec"])
        for r in _batch_sessions(spark).collect()
    )
    assert got == expected
    assert len(expected) > 0
    # multi-batch actually exercised closed emissions AND reopened ones
    assert len(closed) > 0 and len(latest_open) > 0

    # peak concurrency from the streamed sessions == the batch twin
    sess_df = spark.createDataFrame(
        got, "user_id: long, s_sec: long, e_sec: long"
    )
    deltas = sess_df.select(
        F.col("s_sec").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        sess_df.select((F.col("e_sec") + 1).alias("t"), F.lit(-1).alias("d"))
    )
    peak = (
        deltas.groupBy("t")
        .agg(F.sum("d").alias("d"))
        .select(
            F.sum("d")
            .over(
                Window.orderBy("t").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("live")
        )
        .agg(F.max("live").alias("peak"))
        .collect()[0]["peak"]
    )
    batch_peak = (
        load_registry()["dash_peak_concurrency"]
        .fn(spark, SF_DIR)
        .collect()[0]["peak_concurrency"]
    )
    assert peak == batch_peak


def test_streaming_interval_coverage_matches_batch(spark, tmpdir):
    """Streaming interval-union coverage (emit-latest per user) must
    equal the batch sweep's per-user union totals after all
    micro-batches drain."""
    from aiven_challenge2_cdc_sharing_spark.streaming import (
        streaming_interval_coverage,
    )

    events = load_table(spark, SF_DIR, "events")
    t1, t2 = (
        events.selectExpr(
            "percentile_approx(ts, 0.33) p1",
            "percentile_approx(ts, 0.66) p2",
        ).collect()[0]
    )
    parts = [
        events.filter(F.col("ts") <= F.lit(t1)),
        events.filter(
            (F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))
        ),
        events.filter(F.col("ts") > F.lit(t2)),
    ]
    os.makedirs(f"{tmpdir}/cov_in")
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").json(
            f"{tmpdir}/cov_src_{i}"
        )
        f = glob.glob(f"{tmpdir}/cov_src_{i}/part-*.json")[0]
        shutil.copy(f, f"{tmpdir}/cov_in/{i:02d}.json")
        os.utime(
            f"{tmpdir}/cov_in/{i:02d}.json", (time.time() + i * 10,) * 2
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{tmpdir}/cov_in")
    )
    latest: dict[int, int] = {}
    n_batches = []

    def capture(batch_df, batch_id):
        n_batches.append(batch_id)
        for r in batch_df.collect():
            latest[r["user_id"]] = r["covered_s"]

    q = (
        streaming_interval_coverage(stream)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/cov_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert len(n_batches) >= 3  # multi-batch state actually exercised

    # batch twin: the win_interval_union_coverage per-user sweep
    s = F.unix_timestamp("ts").cast("long")
    iv = events.select("user_id", s.alias("s"), (s + 1800).alias("e"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per = (
        iv.select(
            "user_id",
            F.greatest(
                F.lit(0),
                F.col("e")
                - F.greatest(
                    F.col("s"),
                    F.coalesce(F.max("e").over(w), F.col("s")),
                ),
            ).alias("covered"),
        )
        .groupBy("user_id")
        .agg(F.sum("covered").cast("long").alias("total_s"))
    )
    expected = {
        r["user_id"]: r["total_s"] for r in per.collect()
    }
    assert latest == expected
    assert len(expected) > 0


def test_streaming_heavy_hitters_guarantees(spark, tmpdir):
    """Space-saving guarantees vs exact batch counts, across >= 3
    micro-batches: every tracked item satisfies
    est >= true >= est - overcount, and every TRUE heavy hitter
    (count > N_shard/capacity) is present in its shard's summary."""
    from aiven_challenge2_cdc_sharing_spark.streaming import (
        streaming_heavy_hitters,
    )
    from aiven_challenge2_cdc_sharing_spark.streaming.sessions import (
        HH_CAPACITY,
    )

    events = load_table(spark, SF_DIR, "events")
    t1, t2 = (
        events.selectExpr(
            "percentile_approx(ts, 0.33) p1",
            "percentile_approx(ts, 0.66) p2",
        ).collect()[0]
    )
    parts = [
        events.filter(F.col("ts") <= F.lit(t1)),
        events.filter(
            (F.col("ts") > F.lit(t1)) & (F.col("ts") <= F.lit(t2))
        ),
        events.filter(F.col("ts") > F.lit(t2)),
    ]
    os.makedirs(f"{tmpdir}/hh_in")
    for i, part in enumerate(parts):
        part.coalesce(1).write.mode("overwrite").json(
            f"{tmpdir}/hh_src_{i}"
        )
        f = glob.glob(f"{tmpdir}/hh_src_{i}/part-*.json")[0]
        shutil.copy(f, f"{tmpdir}/hh_in/{i:02d}.json")
        os.utime(
            f"{tmpdir}/hh_in/{i:02d}.json", (time.time() + i * 10,) * 2
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{tmpdir}/hh_in")
    )
    latest: dict[tuple, tuple] = {}

    def capture(batch_df, batch_id):
        rows = batch_df.collect()
        # _fold_heavy_hitters emits each updated shard's FULL summary
        # every batch, so a later batch replaces that shard's whole
        # table: clear the shard's previous entries before inserting
        # so evicted items actually vanish from `latest` (otherwise
        # the completeness check would pass vacuously on stale rows —
        # ADVICE r7 finding 3)
        for sh in {r["shard"] for r in rows}:
            for k in [k for k in latest if k[0] == sh]:
                del latest[k]
        for r in rows:
            latest[(r["shard"], r["item"])] = (
                r["est_count"],
                r["max_overcount"],
            )

    q = (
        streaming_heavy_hitters(stream)
        .writeStream.foreachBatch(capture)
        .outputMode("update")
        .option("checkpointLocation", f"{tmpdir}/hh_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert latest

    true_counts = {
        (r["shard"], r["user_id"]): r["c"]
        for r in events.withColumn(
            "shard",
            (F.crc32(F.col("user_id").cast("string")) % 8).cast("int"),
        )
        .groupBy("shard", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    shard_totals: dict[int, int] = {}
    for (sh, _), c in true_counts.items():
        shard_totals[sh] = shard_totals.get(sh, 0) + c

    for (sh, item), (est, over) in latest.items():
        true = true_counts.get((sh, item), 0)
        assert est >= true, (sh, item)
        assert est - over <= true, (sh, item)

    # completeness: every true heavy hitter above the capacity
    # threshold must be tracked in its shard
    tracked = {k for k in latest}
    for (sh, item), c in true_counts.items():
        if c > shard_totals[sh] / HH_CAPACITY:
            assert (sh, item) in tracked, (sh, item, c)
