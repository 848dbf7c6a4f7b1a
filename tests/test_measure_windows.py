"""Unit pin for plan_audit's --measure-windows machinery (round-10
verdict task 4): the executed-plan walker must find unpartitioned
WindowExec nodes and read their TRUE input row count from the nearest
metrics-bearing descendant — this is what turned the 59
ALLOWED_GLOBAL_WINDOW comments into measurements.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from plan_audit import _walk_executed, _window_input_rows  # noqa: E402


def _measure(df):
    ep = df._jdf.queryExecution().executedPlan()
    ep.execute().count()
    out = []
    for node in _walk_executed(ep):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            rows, approx = _window_input_rows(node)
            out.append((rows, approx))
    return out


def test_global_window_input_measured_exactly(spark):
    # 7 groups enter the unpartitioned rank window — the measured
    # input must be 7, not the 5000 source rows
    df = (
        spark.range(5000)
        .withColumn("g", F.col("id") % 7)
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
        .withColumn("rn", F.row_number().over(Window.orderBy("s")))
    )
    wins = _measure(df)
    assert len(wins) == 1
    rows, approx = wins[0]
    assert rows == 7
    assert not approx


def test_partitioned_window_not_flagged(spark):
    df = spark.range(1000).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.col("id") % 10).orderBy("id")
        ),
    )
    assert _measure(df) == []


def test_filter_below_window_counts_post_filter_rows(spark):
    # the window's input is the FILTERED stream: 500 rows, not 1000
    df = (
        spark.range(1000)
        .filter(F.col("id") % 2 == 0)
        .withColumn("rn", F.row_number().over(Window.orderBy("id")))
    )
    wins = _measure(df)
    assert len(wins) == 1
    assert wins[0][0] == 500


def test_checkpoint_capture_measures_hidden_window(spark):
    # A window below an eager localCheckpoint never appears in the
    # final QueryExecution — the round-12 _CheckpointCapture must
    # surface the pre-checkpoint subplan so the window is MEASURED,
    # not comment-attested (round-11 verdict task 4).
    from plan_audit import _CheckpointCapture, _unpartitioned_windows_of

    with _CheckpointCapture() as cap:
        base = (
            spark.range(300)
            .withColumn("rn", F.row_number().over(Window.orderBy("id")))
            .localCheckpoint()
        )
        out = base.groupBy((F.col("id") % 3).alias("g")).count()
        ep = out._jdf.queryExecution().executedPlan()
        ep.execute().count()

    # hidden from the main plan ...
    assert _unpartitioned_windows_of(ep) == []
    # ... but captured: exactly one checkpoint site, whose re-executed
    # subplan shows the 300-row unpartitioned window
    assert len(cap.frames) == 1
    sep = cap.frames[0]._jdf.queryExecution().executedPlan()
    sep.execute().count()
    wins = _unpartitioned_windows_of(sep)
    assert len(wins) == 1
    assert wins[0][0] == 300


def test_checkpoint_capture_restores_patch(spark):
    # the patch lands on the CONCRETE class (pyspark>=4 overrides
    # localCheckpoint in sql.classic.dataframe.DataFrame)
    from pyspark.sql.classic.dataframe import DataFrame

    from plan_audit import _CheckpointCapture

    orig = DataFrame.localCheckpoint
    with _CheckpointCapture():
        assert DataFrame.localCheckpoint is not orig
    assert DataFrame.localCheckpoint is orig
