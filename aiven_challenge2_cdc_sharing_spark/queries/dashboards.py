"""The reference's three dashboard/serving query shapes (README.md:144-163)
applied directly to the driver test tables: terms-agg, date-histogram,
recent-N — each is IMPLIED surface in SURVEY.md §2 (A1, A2, O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "dash_count_by_segment",
    oracle="""
SELECT c_mktsegment, count(*) AS cnt
FROM customer
GROUP BY c_mktsegment
ORDER BY cnt DESC, c_mktsegment
""",
    doc="A1 terms-agg: count by category, ordered by count (README.md:150-152)",
)
def dash_count_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "c_mktsegment")
    )


@register(
    "dash_orders_per_month",
    oracle="""
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS bucket,
       count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
    doc="A2 date-histogram over orders (README.md:154-156 pattern)",
)
def dash_orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("bucket")
    )


@register(
    "dash_recent_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT 10
""",
    doc="O1 recent-N saved search (README.md:158-160 pattern); total order "
    "via (date, key) tiebreak so LIMIT is deterministic",
)
def dash_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(10)
    )


@register(
    "dash_events_per_hour_by_type",
    oracle="""
SELECT date_trunc('hour', ts) AS bucket, event_type, count(*) AS cnt,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY bucket, event_type
ORDER BY bucket, event_type
""",
    doc="A2/T3 batch twin of the streaming tumbling-window count",
)
def dash_events_per_hour_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("bucket", "event_type")
    )


@register(
    "dash_events_sliding_2h",
    oracle="""
SELECT win_start, event_type, count(*) AS cnt
FROM (
  SELECT event_type,
         unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                 date_trunc('hour', ts)]) AS win_start
  FROM events
)
GROUP BY win_start, event_type
ORDER BY win_start, event_type
""",
    doc="T6 sliding windows (2h window, 1h slide) as a batch twin: each "
    "event contributes to exactly two overlapping windows; the oracle "
    "unnests both window starts per event and aggregates — identical "
    "window assignment to Spark's epoch-aligned window(ts, '2 hours', "
    "'1 hour')",
)
def dash_events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.window("ts", "2 hours", "1 hour").alias("win"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "cnt",
        )
        .orderBy("win_start", "event_type")
    )


@register(
    "dash_week_over_week_movers",
    oracle="""
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         event_type,
         round(sum(value), 2) AS total
  FROM events GROUP BY 1, 2
),
wow AS (
  SELECT week, event_type, total,
         lag(total) OVER (PARTITION BY event_type ORDER BY week) AS prev
  FROM weekly
)
SELECT week, event_type, total, prev,
       round((total - prev)
             / (CASE WHEN prev = 0 THEN NULL ELSE prev END) * 100, 2)
         AS pct_change
FROM wow
WHERE prev IS NOT NULL
ORDER BY week, event_type
""",
    doc="week-over-week movers (the trend panel on every ops "
    "dashboard): weekly sums per event type, LAG one period, percent "
    "change.  The window partitions on event_type ONLY AFTER the "
    "weekly aggregation has shrunk the data to (weeks x types) rows — "
    "tiny-domain window partitioning is safe on an aggregate, fatal "
    "on the raw stream (see PLANS.md low-cardinality note).  A zero "
    "prior week is NULLed before the division on BOTH engines: Spark "
    "/0 -> NULL but DuckDB IEEE /0.0 -> +/-Inf, so an unguarded "
    "prev=0 would diverge",
)
def dash_week_over_week_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    weekly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("week", F.col("ts")).alias("week"),
            "event_type",
        )
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return (
        weekly.withColumn("prev", F.lag("total").over(w))
        .filter(F.col("prev").isNotNull())
        .select(
            "week",
            "event_type",
            "total",
            "prev",
            F.round(
                (F.col("total") - F.col("prev"))
                / F.when(F.col("prev") == 0, F.lit(None)).otherwise(
                    F.col("prev")
                )
                * 100,
                2,
            ).alias("pct_change"),
        )
        .orderBy("week", "event_type")
    )


@register(
    "dash_rolling_7d_active_users",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
spine AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT s.day, d.user_id
  FROM spine s JOIN du d
    ON d.day BETWEEN s.day - INTERVAL 6 DAY AND s.day
)
SELECT CAST(day AS TIMESTAMP) AS day,
       count(DISTINCT user_id) AS active_7d
FROM contrib GROUP BY day ORDER BY day
""",
    doc="rolling 7-day distinct active users (the DAU/WAU panel): "
    "sliding-window COUNT DISTINCT is not frame-expressible (distinct "
    "doesn't decompose), so each (day, user) membership joins to the "
    "<=7 window ends it can serve — the standard explode-to-windows "
    "rewrite.  Shuffle carries (day, user_id) pairs deduped FIRST, so "
    "volume is active-pairs x 7, bounded and skew-free; the window "
    "join is a broadcast of the tiny day spine",
)
def dash_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    du = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            "user_id",
        )
        .distinct()
    )
    spine = du.select("day").distinct()
    contrib = du.alias("d").join(
        F.broadcast(spine.alias("s")),
        (F.col("d.day") >= F.date_sub(F.col("s.day"), 6))
        & (F.col("d.day") <= F.col("s.day")),
    )
    return (
        contrib.groupBy(F.col("s.day").cast("timestamp").alias("day"))
        .agg(F.count_distinct("user_id").alias("active_7d"))
        .orderBy("day")
    )


@register(
    "dash_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
cnt AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT from_type, to_type, n,
       round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM cnt
ORDER BY from_type, to_type
""",
    doc="event transition matrix (first-order Markov counts + row-"
    "normalized probabilities — the 'what do users do next' panel): "
    "LEAD over each user's event sequence, then count per (from, to) "
    "and normalize within from_type.  One shuffle on user_id for the "
    "sequence window (the natural partition key, high cardinality), "
    "one tiny (types x types) aggregate after",
)
def dash_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    cnt = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "dash_value_percentiles_daily",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY 1, 2 ORDER BY day, event_type
""",
    doc="daily P50/P95/P99 value percentiles per event type (the "
    "latency-SLO panel): EXACT linear-interpolation percentiles "
    "(Spark percentile == DuckDB quantile_cont), one hash aggregate "
    "on (day, type).  Exact percentile buffers per group are bounded "
    "by group size; at 100 TB with huge groups the approx_percentile "
    "twin (agg_approx_percentile_band, tolerance-gated) is the scale "
    "path — both live in this registry deliberately",
)
def dash_value_percentiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        )
        .orderBy("day", "event_type")
    )
