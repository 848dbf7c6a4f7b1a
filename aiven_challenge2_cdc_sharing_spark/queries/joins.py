"""Join surface (SURVEY.md §2.3, J1-J6).

The reference performs no relational joins (single-table pipeline); this
is the EXT surface mandated by the north star, designed scale-first:

- dimension joins are explicitly ``broadcast()`` (region/nation/supplier
  are tiny at any scale factor — TPC-H dims grow far slower than facts);
- the as-of join is the union+window formulation: ONE shuffle on the
  partition key instead of a per-row probe — the standard distributed
  as-of strategy;
- the range join keys the small side broadcast so no fact shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_join, binned_range_join
from ..tables import load_table
from . import register


@register(
    "join_orders_customer_inner",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 400000
""",
    doc="J1 equi inner join, filter pushed below the join on the fact side",
)
def join_orders_customer_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_customer_orders_left",
    oracle="""
SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
""",
    doc="J1 left outer join + group: customers with zero orders kept (count=0)",
)
def join_customer_orders_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
    )


@register(
    "join_orders_customer_right",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, round(o.o_totalprice, 2) AS price
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
    doc="J1 right outer join: every customer kept, orderless customers "
    "carry NULL order columns (the mirrored form of the left join — "
    "Catalyst normalizes it to a left join with sides swapped)",
)
def join_orders_customer_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "right").select(
        "c_custkey",
        "c_mktsegment",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
    )


@register(
    "join_full_outer_nations",
    oracle="""
SELECT n.n_nationkey,
       coalesce(cn.n_customers, 0) AS n_customers,
       coalesce(sn.n_suppliers, 0) AS n_suppliers
FROM nation n
LEFT JOIN (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY 1) cn
       ON cn.c_nationkey = n.n_nationkey
LEFT JOIN (SELECT s_nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) sn
       ON sn.s_nationkey = n.n_nationkey
""",
    doc="J1 outer joins over pre-aggregated sides (aggregate-below-join: "
    "shuffles the small aggregated sets, never the raw facts twice)",
)
def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    cust_n = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp_n = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        nation.join(cust_n, nation.n_nationkey == cust_n.c_nationkey, "left")
        .join(supp_n, nation.n_nationkey == supp_n.s_nationkey, "left")
        .select(
            "n_nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "join_broadcast_region_rollup",
    oracle="""
SELECT r.r_name, count(*) AS n_customers, round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
    doc="J2 broadcast star join: both dims broadcast, zero fact-side shuffle "
    "before the final group-by",
)
def join_broadcast_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("r_name")
    )


@register(
    "join_semi_active_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    doc="J3 left-semi (EXISTS): no duplication, fact side reduced before join",
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_dormant_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="J3 left-anti (NOT EXISTS)",
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "join_range_value_bands",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 100.0), ('mid', 100.0, 250.0), ('high', 250.0, 1000.0)
)
SELECT b.band, count(*) AS cnt, round(sum(e.value), 2) AS total_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
ORDER BY b.band
""",
    doc="J4 theta/range join: tiny band dim broadcast => BNLJ against a "
    "broadcast table, no fact shuffle",
)
def join_range_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(bands),
            (events.value >= bands.lo) & (events.value < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("band")
    )


@register(
    "join_range_binned_scale",
    oracle="""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 100.0), ('mid', 100.0, 250.0), ('high', 250.0, 1000.0)
)
SELECT b.band, count(*) AS cnt, round(sum(e.value), 2) AS total_value
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
ORDER BY b.band
""",
    doc="J4 scale path: bin-bucketed range join (Databricks range-join-"
    "optimization pattern) — band intervals exploded into 50-wide bins, "
    "hash equi-join on bin, exact re-filter. Same oracle as the BNLJ "
    "variant; cost is rows x bands-per-bin instead of rows x bands",
)
def join_range_binned_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 1000.0)],
        "band string, lo double, hi double",
    )
    joined = binned_range_join(
        events, bands, value="value", lo="lo", hi="hi", bin_width=50.0
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("band")
    )


@register(
    "join_asof_purchase_view",
    oracle="""
SELECT p.event_id AS purchase_id, p.user_id,
       p.ts AS purchase_ts, v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    doc="J5 as-of join: for each purchase, the user's latest earlier 'view'. "
    "Distributed union+window formulation (one shuffle), vs DuckDB ASOF JOIN",
)
def join_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    views = events.filter(F.col("event_type") == "view")
    return asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
    ).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("__asof_ts").alias("last_view_ts"),
    )


@register(
    "join_stream_static_enrich",
    oracle="""
SELECT e.event_id, e.event_type, c.c_mktsegment, round(e.value, 2) AS value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type IN ('purchase', 'signup')
""",
    doc="J6 stream-static enrichment shape (batch twin; the streaming runtime "
    "runs the identical plan under readStream)",
)
def join_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    cust = load_table(spark, sf_dir, "customer")
    return events.join(cust, events.user_id == cust.c_custkey).select(
        "event_id", "event_type", "c_mktsegment", F.round("value", 2).alias("value")
    )
