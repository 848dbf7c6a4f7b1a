"""Aggregation surface (SURVEY.md §2.4, A1-A6).

All of these are single-shuffle hash aggregates with map-side partial
aggregation (Catalyst plans partial+final automatically); rollup/cube
expand the grouping sets before the same single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "agg_stats_by_segment",
    oracle="""
SELECT c_mktsegment,
       count(*) AS cnt,
       count(DISTINCT c_nationkey) AS n_nations,
       round(sum(c_acctbal), 2) AS sum_bal,
       round(avg(c_acctbal), 2) AS avg_bal,
       min(c_acctbal) AS min_bal,
       max(c_acctbal) AS max_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc="A3: sum/avg/min/max/count/count-distinct in one pass",
)
def agg_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "agg_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape: the classic partial-agg stress query; predicate "
    "pushed to the parquet scan",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_rollup_region_nation",
    oracle="""
SELECT r.r_name, n.n_name, count(*) AS cnt
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
    doc="A5 rollup: hierarchical subtotals (region, region+nation, grand)",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "agg_cube_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    doc="A5 cube: all grouping-set combinations",
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    doc="A5 explicit grouping sets (SQL path through spark.sql)",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "agg_having_top_spenders",
    oracle="""
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_custkey
HAVING sum(o_totalprice) > 1500000
""",
    doc="A6 having-style post-aggregation filter",
)
def agg_having_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.sum("o_totalprice").alias("__raw_total"),
        )
        .filter(F.col("__raw_total") > 1500000)
        .drop("__raw_total")
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS exact_custs,
       TRUE AS within_5pct
FROM orders
GROUP BY o_orderstatus
""",
    doc="A4 approx_count_distinct (HLL++): the scale path for distinct "
    "counting — constant memory vs exact countDistinct's shuffle of keys. "
    "The HLL estimate has no exact SQL twin, so the query itself asserts "
    "the rsd=1% sketch lands within 5pct of the exact count; the oracle "
    "pins the exact count and expects within_5pct=TRUE, making the "
    "tolerance — not just row shape — hash-checked",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup-first: mixing exact countDistinct with another aggregate in
    # one agg forces an Expand (2x the input through the shuffle);
    # pre-deduping (status, custkey) makes the exact count a plain count
    # and leaves the HLL estimate unchanged (duplicates never move an
    # HLL register).  Measured 3x faster at sf0.1.
    deduped = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_custkey")
        .distinct()
    )
    return (
        deduped.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("exact_custs"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx"),
        )
        .select(
            "o_orderstatus",
            "exact_custs",
            (
                F.abs(F.col("__approx") - F.col("exact_custs"))
                <= 0.05 * F.col("exact_custs")
            ).alias("within_5pct"),
        )
    )


@register(
    "agg_median_quantile",
    oracle="""
SELECT l_returnflag,
       round(median(l_quantity), 2) AS med_qty,
       round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
FROM lineitem
GROUP BY l_returnflag
""",
    doc="A3 exact percentiles (Spark percentile == DuckDB quantile_cont, "
    "both linear-interpolating)",
)
def agg_median_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: exact percentile builds a per-task value-count map over
    # 600k rows; the single-row-group scan ran it on 1 of 32 threads
    # (round-12; merge of partial count-maps is order-insensitive, so
    # the interpolated result is bit-identical at any partitioning)
    return (
        load_table(spark, sf_dir, "lineitem", spread=True)
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 2).alias("med_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 2).alias("p90_price"),
        )
    )


@register(
    "agg_stddev_variance",
    oracle="""
SELECT c_mktsegment,
       round(stddev_samp(c_acctbal), 2) AS sd_bal,
       round(var_samp(c_acctbal), 2) AS var_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc="A3 second-moment aggregates",
)
def agg_stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.stddev_samp("c_acctbal"), 2).alias("sd_bal"),
            F.round(F.var_samp("c_acctbal"), 2).alias("var_bal"),
        )
    )


@register(
    "agg_stats_moments",
    oracle="""
WITH mu AS (
  SELECT l_returnflag AS rf, avg(l_extendedprice) AS m
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_pop(l_quantity, l_extendedprice), 2) AS qty_price_covp,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covs,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS price_per_qty,
       round(avg(power(l_extendedprice - mu.m, 3))
             / power(avg(power(l_extendedprice - mu.m, 2)), 1.5), 5) AS price_skew,
       round(avg(power(l_extendedprice - mu.m, 4))
             / power(avg(power(l_extendedprice - mu.m, 2)), 2) - 3, 5) AS price_kurt,
       count(*) AS n
FROM lineitem l JOIN mu ON mu.rf = l.l_returnflag
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
""",
    doc="A3+ statistical aggregates: Pearson correlation, population and "
    "sample covariance, regression slope, and third/fourth moments.  "
    "Spark's skewness/kurtosis are POPULATION g1/g2 (DuckDB's built-ins "
    "are bias-corrected sample versions) so the oracle recomputes them "
    "from centered moments via a pre-joined per-group mean — centered, "
    "not raw-moment, so no catastrophic cancellation at 1e5-scale "
    "prices",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covp"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "qty_price_covs"
            ),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
                "price_per_qty"
            ),
            F.round(F.skewness("l_extendedprice"), 5).alias("price_skew"),
            F.round(F.kurtosis("l_extendedprice"), 5).alias("price_kurt"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_listagg_nations",
    oracle="""
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       count(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
    doc="LISTAGG / grouped string concatenation (the warehouse "
    "reporting staple): per-region sorted nation roster.  "
    "collect_list is unordered across partitions, so the sort "
    "happens INSIDE the aggregate result (array_sort before join) — "
    "the only way grouped concatenation is deterministic on a "
    "distributed engine",
)
def agg_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
        .orderBy("r_name")
    )
