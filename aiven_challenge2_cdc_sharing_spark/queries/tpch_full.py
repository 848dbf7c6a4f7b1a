"""The remaining TPC-H query shapes (Q2, Q6, Q8, Q9, Q11, Q13, Q15,
Q18, Q20, Q21, Q22) — with Q1/3/4/5/7/10/12/14/16/17/19 already in
``tpch_like.py`` / ``aggregates.py`` this completes all 22 classic
warehouse plans over the driver star schema.

The testdata has no ``partsupp`` table and no commit/receipt dates, so
the partsupp-driven queries (Q2/Q11/Q20) treat ``lineitem`` as the
part-supplier supply relation (as Q16/Q17 already do) and Q21's
"kept orders waiting" lateness predicate is ``l_shipdate >
o_orderdate + 75 days``.  Every adaptation keeps the *plan shape* the
query is famous for: Q2's decorrelated min-cost join-back, Q13's
outer-join double aggregation, Q21's multi-relation EXISTS / NOT
EXISTS, Q22's scalar-subquery threshold + anti join.

Scale notes (100 TB):
- Scalar subqueries (Q11/Q15/Q22 thresholds) become 1-row broadcasts
  (``crossJoin(broadcast(...))``) — no shuffle, no driver collect.
- Q21's EXISTS/NOT-EXISTS pair is re-expressed as ONE per-order
  aggregate joined back (distinct-supplier + distinct-late-supplier
  counts) instead of two self-joins of the fact table — the classic
  Spark-first decorrelation: 1 shuffle on l_orderkey replaces two.
- Q18's IN-subquery is a groupBy-HAVING semi join on the same key the
  outer aggregate shuffles on, so AQE coalesces into one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: pure scan-filter-aggregate, no join — every "
    "predicate reaches PushedFilters on the parquet scan and the agg "
    "is a single partial+final pair",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH supply AS (
  SELECT l.l_partkey, l.l_suppkey,
         round(avg(l.l_extendedprice / l.l_quantity), 4) AS supply_cost
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey
), best AS (
  SELECT l_partkey, min(supply_cost) AS best_cost FROM supply GROUP BY l_partkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
       su.supply_cost
FROM part p
JOIN supply su ON su.l_partkey = p.p_partkey
JOIN best b ON b.l_partkey = p.p_partkey AND su.supply_cost = b.best_cost
JOIN supplier s ON s.s_suppkey = su.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_size = 15 AND p.p_type = 'ECONOMY'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 shape: min-cost supplier per part in a region "
    "(lineitem stands in for partsupp).  The correlated MIN subquery "
    "decorrelates into min-over-window on the SAME l_partkey "
    "partitioning the supply aggregate shuffles on — one lineitem "
    "scan, one fact shuffle, no aggregate-join-back; dims and the "
    "size/type-filtered part list broadcast",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "ECONOMY")
    )
    euro_supp = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
    )
    # One explicit shuffle on l_partkey serves three consumers: the
    # (partkey, suppkey) aggregate (subset-clustered is enough), the
    # min-per-partkey window, and nothing downstream — the decorrelated
    # MIN subquery becomes a window + filter instead of a second
    # aggregate joined back, which halves the exchanges and scans
    # lineitem once instead of twice.
    from pyspark.sql import Window

    supply = (
        li.join(
            F.broadcast(euro_supp.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias(
                "supply_cost"
            )
        )
    )
    best_rows = supply.withColumn(
        "best_cost", F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supply_cost") == F.col("best_cost"))
    supp_info = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", "s_name", "s_nationkey"
    )
    return (
        best_rows.join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(supp_info), F.col("l_suppkey") == supp_info.s_suppkey)
        .join(nation, supp_info.s_nationkey == nation.n_nationkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q8_market_share",
    oracle="""
WITH all_lines AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM all_lines
GROUP BY o_year
ORDER BY o_year
""",
    doc="TPC-H Q8 shape: a nation's market share of regional volume by "
    "year — 8-way join with both customer-side and supplier-side "
    "nation lookups; all dims broadcast so the 3 fact tables shuffle "
    "only on their join keys; the share is a conditional-sum ratio",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = load_table(spark, sf_dir, "nation")
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    cn = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "AMERICA")
        .select(F.col("n_nationkey").alias("__cnk"))
    )
    sn = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
        )
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(cn, F.col("__cnk") == cust.c_nationkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(sn, F.col("__snk") == supp.s_nationkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.5 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9 shape: profit by supplier nation and year for parts "
    "matching a name pattern; supply cost proxied as 0.5*p_retailprice "
    "(no partsupp table).  part/supplier/nation broadcast; lineitem "
    "shuffles once on l_orderkey for the orders join",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "tpch_q11_important_parts",
    oracle="""
WITH supply_value AS (
  SELECT l.l_partkey AS p_partkey,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY l.l_partkey
)
SELECT p_partkey, value
FROM supply_value
WHERE value > (SELECT sum(value) * 0.002 FROM supply_value)
ORDER BY value DESC, p_partkey
""",
    doc="TPC-H Q11 shape: parts representing a significant share of one "
    "nation's supply value.  The scalar threshold subquery becomes a "
    "1-row broadcast crossJoin — the supply aggregate is computed "
    "once, localCheckpoint-free (Catalyst reuses the exchange for "
    "both branches under AQE)",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    nat_supp = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    supply_value = (
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("value")
        )
    )
    # materialize once: the per-part value table feeds both the global
    # threshold aggregate and the filter — without this the whole
    # lineitem join+agg subtree is planned (and scanned) twice
    supply_value = supply_value.localCheckpoint(eager=False)
    threshold = supply_value.agg((F.sum("value") * 0.002).alias("__thr"))
    return (
        supply_value.crossJoin(F.broadcast(threshold))
        .filter(F.col("value") > F.col("__thr"))
        .select("p_partkey", "value")
        .orderBy(F.desc("value"), "p_partkey")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '5-LOW'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13 shape: distribution of order counts per customer — "
    "outer join with an ON-clause filter (kept customers with zero "
    "orders) under a double aggregation.  First agg shuffles on "
    "custkey (same key as the join, one exchange under AQE); the "
    "second agg is on the tiny (c_count) domain",
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    c_orders = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15 shape: supplier(s) with the maximum quarterly "
    "revenue.  The revenue view is computed once; the scalar MAX "
    "becomes a 1-row broadcast; ties (all max suppliers) are kept "
    "exactly as the spec requires",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(supp, supp.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       sum(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 200
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderdate, o_orderkey
LIMIT 100
""",
    doc="TPC-H Q18 shape: large-volume orders — IN-subquery over a "
    "groupBy-HAVING on the same fact re-expressed as a left-semi join "
    "on l_orderkey; the filter agg, the semi join, and the outer agg "
    "all shuffle on the order key so AQE reuses one exchange",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = F.broadcast(load_table(spark, sf_dir, "customer"))
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("__bok"))
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 200)
        .select("__bok")
    )
    return (
        orders.join(big, orders.o_orderkey == F.col("__bok"), "left_semi")
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@register(
    "tpch_q20_promotion_suppliers",
    oracle="""
SELECT s.s_name, n.n_name AS nation
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%red%'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l.l_suppkey
  HAVING sum(l.l_quantity) > 300
)
AND n.n_name IN ('NATION_3', 'NATION_4')
ORDER BY s_name
""",
    doc="TPC-H Q20 shape: suppliers who moved significant volume of a "
    "part family in a year (lineitem stands in for partsupp/availqty). "
    "Nested IN-subquery = groupBy-HAVING then left-semi join; part dim "
    "broadcast into the fact scan, quantity sums are exact "
    "integer-valued doubles so the HAVING boundary is engine-stable",
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    movers = (
        li.join(part, part.p_partkey == li.l_partkey)
        .groupBy(F.col("l_suppkey").alias("__sk"))
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 300)
        .select("__sk")
    )
    return (
        supp.join(movers, supp.s_suppkey == F.col("__sk"), "left_semi")
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .filter(F.col("n_name").isin("NATION_3", "NATION_4"))
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, count(*) AS numwait
FROM lines l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE l1.is_late = 1 AND n.n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late = 1)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
""",
    doc="TPC-H Q21 shape: suppliers who were the SOLE late supplier on "
    "multi-supplier finished orders (lateness = shipped >75 days after "
    "order date; no receipt/commit dates in the testdata).  The "
    "EXISTS + NOT EXISTS pair decorrelates into ONE per-order "
    "aggregate — countDistinct(supplier) and countDistinct(late "
    "supplier) — joined back on l_orderkey: a late line is a waiting "
    "line iff the order has >=2 suppliers and exactly 1 late supplier "
    "(necessarily this one).  Two fact self-joins collapse into one "
    "shuffle",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = F.broadcast(load_table(spark, sf_dir, "supplier"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    lines = li.join(orders, orders.o_orderkey == li.l_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS"), 1
        )
        .otherwise(0)
        .alias("is_late"),
    )
    # Single pass over the joined lines: the per-order distinct-supplier
    # counts come from collect_set windows on the SAME l_orderkey
    # partitioning — no aggregate-then-join-back, so the lineitem join
    # is scanned once and the only fact shuffle is the window's (the
    # per-order supplier sets are tiny, so collect_set state is bounded)
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey")
    counted = lines.withColumn(
        "__n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "__n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("is_late") == 1, F.col("l_suppkey"))
            ).over(w)
        ),
    )
    return (
        counted.filter(
            (F.col("is_late") == 1)
            & (F.col("__n_supp") >= 2)
            & (F.col("__n_late_supp") == 1)
        )
        .join(supp, supp.s_suppkey == F.col("l_suppkey"))
        .join(nation, nation.n_nationkey == supp.s_nationkey)
        .filter(F.col("n_name") == "NATION_5")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
WITH candidates AS (
  SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode, c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey % 5 IN (0, 1, 2)
)
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM candidates c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM candidates WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
""",
    doc="TPC-H Q22 shape: well-funded customers with no recent orders, "
    "by country code (nationkey band stands in for the phone prefix; "
    "every sf0.01 customer has SOME order so 'lapsed since 1999' "
    "stands in for 'never ordered').  "
    "The scalar AVG subquery is a 1-row broadcast; the NOT EXISTS is a "
    "left-anti join against orders — at 100 TB the anti join shuffles "
    "only (custkey) pairs and the candidate set is pre-filtered "
    "before it",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        (F.col("c_nationkey") % 5).isin(0, 1, 2)
    )
    candidates = cust.select(
        (F.col("c_nationkey") % 5).cast("int").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    )
    avg_bal = candidates.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        candidates.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, orders.o_custkey == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
