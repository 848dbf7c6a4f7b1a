"""Product-analytics shapes: funnels, cohort retention, histograms.

The reference's dashboards are single-table aggregates (count by
classification, date histogram, recent-N — README.md:150-160); these
are the next three queries every analytics deployment adds.  All are
single-shuffle shapes: funnel and retention reduce events to one row
per user (or user-week) before any join, and the histogram is a pure
groupBy on a computed bucket — each projects to 100 TB as one fact
shuffle of small keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "funnel_view_purchase",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS first_view,
         min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
  FROM events
  GROUP BY user_id
)
SELECT count(*) AS n_users,
       count(first_view) AS n_viewers,
       count(*) FILTER (WHERE first_purchase > first_view) AS n_converted,
       round(CAST(count(*) FILTER (WHERE first_purchase > first_view) AS DOUBLE)
             / count(first_view), 6) AS view_to_purchase_rate
FROM per_user
""",
    doc="Two-step funnel (view -> later purchase): events collapse to "
    "one row per user (first view / first purchase) in a single "
    "shuffle, then one global aggregate — no self-join, no window "
    "over raw events.  The conversion predicate is strict event-time "
    "order (purchase after first view)",
)
def funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = F.col("first_purchase") > F.col("first_view")
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewers"),
        F.count(F.when(converted, 1)).alias("n_converted"),
        F.round(
            F.count(F.when(converted, 1)).cast("double")
            / F.count("first_view"),
            6,
        ).alias("view_to_purchase_rate"),
    )


@register(
    "cohort_weekly_retention",
    oracle="""
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
  FROM events
),
cohorts AS (
  SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
)
SELECT c.cohort_week,
       w.week - c.cohort_week AS weeks_since,
       count(*) AS active_users
FROM weekly w JOIN cohorts c ON w.user_id = c.user_id
GROUP BY c.cohort_week, weeks_since
ORDER BY c.cohort_week, weeks_since
""",
    doc="Weekly cohort retention: users bucketed by first-active week, "
    "counted in each later week.  Events dedup to (user, week) first "
    "(the big reduction), cohort table is one row per user and joins "
    "back on user_id — the same shuffle key, so Catalyst reuses the "
    "exchange; the retention matrix itself is tiny",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    weekly = ev.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / 604800)).cast("long").alias("week"),
    ).distinct()
    cohorts = weekly.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        weekly.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "agg_value_histogram",
    oracle="""
SELECT CASE WHEN value < 0 THEN 0
            WHEN value >= 1000 THEN 21
            ELSE CAST(floor(value / 50) + 1 AS BIGINT) END AS bucket,
       count(*) AS cnt,
       round(min(value), 2) AS lo_seen,
       round(max(value), 2) AS hi_seen
FROM events
GROUP BY bucket
ORDER BY bucket
""",
    doc="Equal-width numeric histogram via width_bucket (20 buckets "
    "over [0, 1000)): one groupBy on a computed bucket id — the "
    "map-side combine means shuffle volume is O(buckets), not O(rows). "
    "DuckDB has no width_bucket, so the oracle is the explicit "
    "floor-arithmetic twin (underflow bucket 0, overflow 21)",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.width_bucket("value", F.lit(0.0), F.lit(1000.0), F.lit(20)).alias(
                "bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("value"), 2).alias("lo_seen"),
            F.round(F.max("value"), 2).alias("hi_seen"),
        )
        .orderBy("bucket")
    )


@register(
    "user_behavior_entropy",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
),
t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY user_id),
k AS (SELECT greatest(count(DISTINCT event_type), 2) AS n_types FROM events)
SELECT c.user_id,
       CAST(t.tot AS BIGINT) AS n_events,
       round(-sum((n * 1.0 / tot) * ln(n * 1.0 / tot)), 6) AS entropy,
       round(-sum((n * 1.0 / tot) * ln(n * 1.0 / tot))
             / ln((SELECT n_types FROM k)), 6) AS entropy_norm
FROM c JOIN t USING (user_id)
GROUP BY c.user_id, t.tot
ORDER BY c.user_id
""",
    doc="behavioral entropy per user (Shannon entropy of the event-type "
    "distribution, normalized by ln(num OBSERVED types)) — the "
    "engagement-diversity feature every churn/segmentation model "
    "starts with.  The normalizer is computed from the data (1-row "
    "countDistinct aggregate, broadcast crossJoin; scalar subquery in "
    "the oracle), not a hardcoded domain size, so entropy_norm stays "
    "in [0,1] whatever the event_type domain; greatest(k,2) guards "
    "the degenerate 1-type corpus where ln(1)=0 would divide by "
    "zero.  Two aggregates sharing the user_id partitioning (the "
    "per-type count reuses the exchange of the per-user total join); "
    "all JVM expressions, exact oracle",
)
def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    n_types = ev.agg(
        F.greatest(F.count_distinct("event_type"), F.lit(2)).alias("__k")
    )
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "user_id")
        .crossJoin(F.broadcast(n_types))
        .groupBy("user_id", "tot", "__k")
        .agg(
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
            F.round(
                -F.sum(p * F.log(p)) / F.log(F.col("__k").cast("double")), 6
            ).alias("entropy_norm"),
        )
        .select(
            "user_id",
            F.col("tot").cast("long").alias("n_events"),
            "entropy",
            "entropy_norm",
        )
        .orderBy("user_id")
    )
