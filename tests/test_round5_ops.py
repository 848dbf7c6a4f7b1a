"""Round-5 additions: scale-safe twins + the plan-audit window rule."""

from __future__ import annotations

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from aiven_challenge2_cdc_sharing_spark.plans.inspect import (  # noqa: E402
    explain_str,
)
from aiven_challenge2_cdc_sharing_spark.queries import (  # noqa: E402
    load_registry,
)


def _unpartitioned_windows(df) -> int:
    from tools.plan_audit import count_unpartitioned_windows

    return count_unpartitioned_windows(explain_str(df))


def test_window_rule_catches_global_sort(spark):
    df = spark.range(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    assert _unpartitioned_windows(df) == 1


def test_window_rule_passes_partitioned_window(spark):
    df = spark.range(100).withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(F.col("id") % 10).orderBy("id")),
    )
    assert _unpartitioned_windows(df) == 0


def test_window_rule_passes_partitioned_unordered_window(spark):
    # Arguments prints only 2 bracket groups here too — the rule must
    # not confuse the partition spec for an order spec
    df = spark.range(100).withColumn(
        "s", F.sum("id").over(Window.partitionBy(F.col("id") % 10))
    )
    assert _unpartitioned_windows(df) == 0


def test_scalable_twins_have_no_global_window(spark, sf_dir):
    reg = load_registry()
    for name in (
        "agg_equidepth_histogram_scalable",
        "dash_peak_concurrency_scalable",
    ):
        df = reg[name].fn(spark, sf_dir)
        assert _unpartitioned_windows(df) == 0, name


def test_peak_concurrency_twins_agree(spark, sf_dir):
    reg = load_registry()
    a = reg["dash_peak_concurrency"].fn(spark, sf_dir).collect()
    b = reg["dash_peak_concurrency_scalable"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_equidepth_scalable_depth_claim(spark, sf_dir):
    rows = (
        load_registry()["agg_equidepth_histogram_scalable"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert [r["bin"] for r in rows] == list(range(1, 9))
    assert all(r["depth_within_5pct"] for r in rows)


def test_global_prefix_sum_matches_window(spark):
    from aiven_challenge2_cdc_sharing_spark.operators.topk import (
        global_prefix_sum,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 11 - 5).alias("v")
    )
    got = {
        r["k"]: r["ps"]
        for r in global_prefix_sum(df, [F.col("k")], "v", out_col="ps")
        .collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["ps"]
        for r in df.withColumn("ps", F.sum("v").over(w)).collect()
    }
    assert got == want
