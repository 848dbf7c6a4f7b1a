"""Second wave of coverage extras: boolean/conditional aggregates,
multi-quantiles, date arithmetic, string extras, dense (zero-filled)
time histograms."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "agg_bool_countif",
    oracle="""
SELECT c_mktsegment,
       count(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
       bool_and(c_acctbal > -1000) AS all_above_floor,
       bool_or(c_acctbal < 0) AS any_debt
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="A3 boolean aggregates: count_if / bool_and / bool_or (same "
    "names both engines; Spark count_if == DuckDB count FILTER)",
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count_if(F.col("c_acctbal") > 5000).alias("n_rich"),
            F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
            F.bool_or(F.col("c_acctbal") < 0).alias("any_debt"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_quartiles",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_extendedprice, 0.25) AS q1,
       quantile_disc(l_extendedprice, 0.50) AS q2,
       quantile_disc(l_extendedprice, 0.75) AS q3
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="A3 exact discrete quartiles — percentile_disc semantics (actual "
    "data values, no interpolation), so even-count groups of 2-decimal "
    "prices can't land on a cross-engine round-half boundary.  "
    "Implemented as ONE sorted buffer per group indexed at ceil(p*n) "
    "(== percentile_disc's smallest-value-with-cume>=p, verified "
    "bit-identical) instead of three independent percentile_disc "
    "aggregates that each re-buffer and re-sort the group: 6x faster "
    "at sf0.1 (3.7s -> 0.6s).  Both forms buffer O(group) in one "
    "task; at 100 TB pre-aggregate (flag, price) counts first",
)
def agg_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    sorted_prices = F.sort_array(F.collect_list("l_extendedprice"))
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sorted_prices.alias("__s"), F.count(F.lit(1)).alias("__n"))
        .select(
            "l_returnflag",
            *[
                F.element_at(
                    "__s", F.ceil(F.lit(p) * F.col("__n")).cast("int")
                ).alias(name)
                for p, name in [(0.25, "q1"), (0.50, "q2"), (0.75, "q3")]
            ],
        )
        .orderBy("l_returnflag")
    )


@register(
    "fn_datediff_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       date_diff('day', o.o_orderdate, l.l_shipdate) AS days_to_ship,
       CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 365
            THEN 'slow' ELSE 'fast' END AS ship_speed
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
    doc="date difference arithmetic across a join (Spark datediff == "
    "DuckDB date_diff('day', ...))",
)
def fn_datediff_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            days.alias("days_to_ship"),
            F.when(days > 365, "slow").otherwise("fast").alias("ship_speed"),
        )
    )


@register(
    "fn_string_extras",
    oracle="""
SELECT s_suppkey,
       translate(s_name, '#', '_') AS name_clean,
       strpos(s_name, '#') AS hash_pos,
       left(s_name, 8) AS name_left,
       right(s_name, 4) AS name_right,
       repeat('=', CAST(s_suppkey % 5 AS INTEGER)) AS bar,
       ascii(s_name) AS first_code
FROM supplier
""",
    doc="string extras: translate/position/left/right/repeat/ascii",
)
def fn_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.translate("s_name", "#", "_").alias("name_clean"),
        F.instr("s_name", "#").alias("hash_pos"),
        F.expr("left(s_name, 8)").alias("name_left"),
        F.expr("right(s_name, 4)").alias("name_right"),
        F.repeat(F.lit("="), (F.col("s_suppkey") % 5).cast("int")).alias("bar"),
        F.ascii("s_name").alias("first_code"),
    )


@register(
    "dash_orders_per_month_dense",
    oracle="""
WITH spine AS (
  SELECT unnest(generate_series(
           CAST(date_trunc('month', (SELECT min(o_orderdate) FROM orders)) AS TIMESTAMP),
           CAST(date_trunc('month', (SELECT max(o_orderdate) FROM orders)) AS TIMESTAMP),
           INTERVAL 1 MONTH)) AS bucket
),
actual AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS bucket,
         count(*) AS cnt
  FROM orders GROUP BY 1
)
SELECT s.bucket, coalesce(a.cnt, 0) AS cnt
FROM spine s LEFT JOIN actual a ON s.bucket = a.bucket
ORDER BY s.bucket
""",
    doc="A2 dense date-histogram: zero-filled month spine via sequence() "
    "— dashboards need empty buckets rendered, not skipped",
)
def dash_orders_per_month_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("bucket")
    )
    actual = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        spine.join(actual, "bucket", "left")
        .select("bucket", F.coalesce("cnt", F.lit(0)).alias("cnt"))
        .orderBy("bucket")
    )
