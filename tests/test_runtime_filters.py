"""Runtime-filter and adaptive-execution contracts.

At 100 TB the wins that matter most are the ones Catalyst/AQE injects
at runtime: a bloom filter built from the selective side of a shuffle
join and pushed into the probe side's scan (cuts shuffle volume by the
dim filter's selectivity), and skew-join splitting (turns one straggler
partition into many parallel tasks).  These tests pin that the engine's
session actually triggers both — configs alone prove nothing if the
thresholds never fire."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.tables import load_table


@contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """A selective dim filter on one join side should inject a
    bloom_filter_agg / might_contain pair into the probe side once the
    size thresholds allow it (here: forced low so the local fixture
    qualifies; on a real cluster the defaults fire for 10 MB dims)."""
    with _confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # creation side must be under this threshold: keep default 10MB
            # application side must exceed this scan-size threshold: force 0
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            # and demote broadcast so the join actually shuffles
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        joined = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan or "BloomFilter" in plan, plan[:2000]


def test_aqe_skew_join_splits_straggler(spark, sf_dir):
    """With thresholds forced tiny, AQE must mark the skewed join side
    (plan node carries ``skew=true``) instead of leaving one giant
    partition to straggle."""
    skewed = (
        spark.range(0, 200_000)
        .select((F.col("id") % 5 == 0).cast("int").alias("k"), F.col("id"))
    )  # ~80% of rows land on k=0
    dim = spark.range(0, 2).select(
        F.col("id").cast("int").alias("k"), F.lit("x").alias("tag")
    )
    with _confs(
        spark,
        **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        joined = skewed.join(dim, "k")
        # AQE decides skew handling at runtime, and only THIS
        # DataFrame's QueryExecution carries the final plan — a
        # .count() would execute a different (aggregated) plan.
        assert len(joined.collect()) == 200_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
