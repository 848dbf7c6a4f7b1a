"""Window-function surface (SURVEY.md §2.5, W1-W4; §2.6 O3).

Every ordering includes a unique tiebreak column so ranks and frames
are total-ordered — required for cross-engine determinism and the same
property that makes the CDC materializer order-robust.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import top_k_per_group
from ..tables import load_table
from . import register


@register(
    "win_rank_orders_by_price",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
    doc="W2 rank/dense_rank per status",
)
def win_rank_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_ntile_quartiles",
    oracle="""
SELECT c_custkey, c_mktsegment,
       ntile(4) OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
""",
    doc="W2 ntile bucketing per segment",
)
def win_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "win_lag_lead_user_events",
    oracle="""
SELECT event_id, user_id,
       round(lag(value)  OVER w, 2) AS prev_value,
       round(lead(value) OVER w, 2) AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    doc="W3 lag/lead — the relational twin of Debezium before/after images "
    "(reference consumer_to_opensearch.py:79-92)",
)
def win_lag_lead_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 2).alias("prev_value"),
        F.round(F.lead("value").over(w), 2).alias("next_value"),
    )


@register(
    "win_running_total",
    oracle="""
SELECT o_orderkey, o_custkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
    doc="W4 running aggregate over an unbounded-preceding frame",
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "win_moving_sum",
    oracle="""
SELECT event_id, user_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS msum
FROM events
""",
    doc="W4 bounded sliding frame (4-row moving sum; sum rather than avg so "
    "2-decimal inputs stay off the .005 round-half boundary cross-engine)",
)
def win_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 2).alias("msum")
    )


@register(
    "win_range_frame_sum",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_orderstatus ORDER BY o_totalprice
         RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW), 2) AS nearby_total
FROM orders
""",
    doc="W4 value-RANGE frame: sum over rows within a 10k price band "
    "below the current row — frame membership defined by values, so "
    "ties are handled identically in both engines.  NOT expressed as "
    "PARTITION BY o_orderstatus (3 values = 3 tasks at any cluster "
    "size, a straggler/OOM scale-killer); see the bucketed two-pass "
    "decomposition below",
)
def win_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame sum via bucketed two-pass decomposition.

    Bucket width == frame width (10k), so every frame [p-10k, p] spans
    exactly the row's own bucket plus the previous one:

      A = sum of same-bucket rows with value <= p (all are > p-10k
          since the bucket starts above it) — a RANGE-to-current-row
          window inside (status, bucket); RANGE, not ROWS, so ties of
          p are all included exactly as the spec frame does.
      B = sum of previous-bucket rows with value >= p-10k
        = bucket_total - prefix_strict(p-10k), where prefix_strict is
          read off a single windowed pass over the previous bucket's
          rows UNIONed with one phantom threshold row per source row
          (phantoms order before equal-valued reals, carry weight 0).

    Every window partitions on (status, bucket): parallelism scales
    with the value domain instead of pinning the whole table to 3
    status partitions.  p-10000 is IEEE-exact (exponent can only
    decrease), so the >= boundary bit-matches DuckDB's RANGE frame.
    """
    width = 10_000
    src = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .withColumn(
            "__b", F.floor(F.col("o_totalprice") / width).cast("long")
        )
    )
    w_a = (
        Window.partitionBy("o_orderstatus", "__b")
        .orderBy("o_totalprice")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_a = src.withColumn("__A", F.sum("o_totalprice").over(w_a))

    reals = src.select(
        "o_orderstatus",
        F.col("__b").alias("__pb"),
        F.col("o_totalprice").alias("__val"),
        F.lit(1).alias("__real"),
        F.lit(None).cast("long").alias("__key"),
        F.col("o_totalprice").alias("__wt"),
    )
    phantoms = src.select(
        "o_orderstatus",
        (F.col("__b") - 1).alias("__pb"),
        (F.col("o_totalprice") - width).alias("__val"),
        F.lit(0).alias("__real"),
        F.col("o_orderkey").alias("__key"),
        F.lit(0.0).alias("__wt"),
    )
    w_p = (
        Window.partitionBy("o_orderstatus", "__pb")
        .orderBy("__val", "__real")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix_strict = (
        reals.unionByName(phantoms)
        .withColumn("__pfx", F.sum("__wt").over(w_p))
        .filter(F.col("__real") == 0)
        .select("__key", "o_orderstatus", "__pb", "__pfx")
    )
    totals = src.groupBy(
        "o_orderstatus", F.col("__b").alias("__pb")
    ).agg(F.sum("o_totalprice").alias("__tot"))
    part_b = prefix_strict.join(totals, ["o_orderstatus", "__pb"], "left").select(
        "__key",
        (F.coalesce("__tot", F.lit(0.0)) - F.coalesce("__pfx", F.lit(0.0))).alias(
            "__prevsum"
        ),
    )
    return with_a.join(
        part_b, with_a.o_orderkey == part_b.__key
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("__A") + F.col("__prevsum"), 2).alias("nearby_total"),
    )


@register(
    "win_latest_event_per_user",
    oracle="""
SELECT user_id, event_id, event_type, ts
FROM (SELECT user_id, event_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    doc="W1 latest-state-per-key — the CDC snapshot pattern on the events "
    "stream (upsert-by-id semantics, consumer_to_opensearch.py:94-95)",
)
def win_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


@register(
    "win_top3_orders_per_segment",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice, rn
FROM (SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rn <= 3
""",
    doc="O3 per-group top-k: WindowGroupLimit pushes the k-limit below the "
    "shuffle so only ~k rows per group per partition move",
)
def win_top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    return top_k_per_group(
        joined,
        group=["c_mktsegment"],
        order=[F.desc("o_totalprice"), F.col("o_orderkey")],
        k=3,
    )


@register(
    "win_value_functions",
    oracle="""
SELECT event_id, user_id,
       round(first_value(value) OVER w, 2) AS first_v,
       round(last_value(value) OVER wf, 2) AS last_v,
       round(nth_value(value, 2) OVER wf, 2) AS second_v
FROM events
WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
       wf AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    doc="W2+ value functions: first_value on the default (standard "
    "RANGE-to-current) frame, last_value/nth_value on the explicit "
    "full frame — the default frame would make last_value degenerate "
    "to the current row in BOTH engines, so the full frame is spelled "
    "out identically on both sides",
)
def win_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round(F.first("value").over(w), 2).alias("first_v"),
        F.round(F.last("value").over(wf), 2).alias("last_v"),
        F.round(F.nth_value("value", 2).over(wf), 2).alias("second_v"),
    )
