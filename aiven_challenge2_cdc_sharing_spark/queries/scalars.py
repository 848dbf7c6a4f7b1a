"""Scalar-function surface (SURVEY.md §2.8) — string / datetime / math /
json / conditional / array families, each exercised against the oracle.

Everything stays JVM-side (built-in pyspark.sql.functions inside
whole-stage codegen); no Python UDFs anywhere in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


@register(
    "fn_string_suite",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_name) AS name_lower,
       length(c_name) AS name_len,
       substr(c_name, 1, 8) AS name_prefix,
       reverse(c_name) AS name_rev,
       concat(c_name, ':', c_mktsegment) AS name_tagged,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded,
       regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
       levenshtein(c_mktsegment, 'BUILDING') AS seg_dist,
       CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS is_customer
FROM customer
""",
    doc="string family: case/slice/pad/regex/levenshtein/like",
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.reverse("c_name").alias("name_rev"),
        F.concat("c_name", F.lit(":"), "c_mktsegment").alias("name_tagged"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
        F.when(F.col("c_name").like("Customer%"), 1).otherwise(0).alias("is_customer"),
    )


@register(
    "fn_datetime_suite",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate) AS o_day,
       quarter(o_orderdate) AS o_quarter,
       CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS o_week,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
FROM orders
""",
    doc="datetime family: extract/trunc/interval arithmetic/last_day",
)
def fn_datetime_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.date_trunc("week", "o_orderdate").alias("o_week"),
        F.expr("o_orderdate + INTERVAL 30 DAYS").alias("due_date"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
    )


@register(
    "fn_math_suite",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(l_discount - 0.05) AS disc_dev,
       round(l_extendedprice, 0) AS price_round,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
       round(sqrt(l_quantity), 4) AS qty_sqrt,
       round(power(1 + l_tax, 2), 6) AS tax_sq,
       round(ln(l_extendedprice), 6) AS price_ln,
       CAST(l_partkey % 97 AS BIGINT) AS partkey_mod,
       CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign
FROM lineitem
""",
    doc="math family: abs/round/floor/ceil/sqrt/pow/ln/mod/sign",
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round("l_extendedprice", 0).alias("price_round"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow(F.lit(1) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        (F.col("l_partkey") % 97).alias("partkey_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@register(
    "fn_json_suite",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
            THEN 1 ELSE 0 END AS has_k
FROM events
""",
    doc="json family: schema-on-read extraction from the props JSON string "
    "(the reference's whole wire format is schemaless JSON, main.tf:261-264)",
)
def fn_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.when(F.get_json_object("props", "$.k").isNotNull(), 1)
        .otherwise(0)
        .alias("has_k"),
    )


@register(
    "fn_conditional_suite",
    oracle="""
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS bal_bucket,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 1000.0) AS bal_cap1k,
       CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_is_null
FROM customer
""",
    doc="conditional/null family: CASE/coalesce/nullif/greatest/least "
    "(the P6 op-dispatch pattern as column logic)",
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_bucket"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_or_default"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap1k"),
        F.when(F.col("c_acctbal").isNull(), 1).otherwise(0).alias("bal_is_null"),
    )


@register(
    "fn_map_suite",
    oracle="""
SELECT event_id,
       event_type AS k_first,
       round(value, 2) AS v_first,
       2 AS n_keys,
       CASE WHEN event_type = 'click' THEN round(value, 2) ELSE NULL END
         AS click_value
FROM events
""",
    doc="map family: create_map / map_keys / map_values / element_at — "
    "the oracle recomputes the extracted scalars directly (DuckDB's MAP "
    "literals differ syntactically; the extraction semantics are what's "
    "checked)",
)
def fn_map_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.col("event_type"), F.round("value", 2),
        F.lit("__const"), F.lit(-1.0),
    )
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("k_first"),
        F.element_at(F.map_values(m), 1).alias("v_first"),
        F.size(m).alias("n_keys"),
        F.element_at(m, F.lit("click")).alias("click_value"),
    )


@register(
    "fn_array_suite",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)), 4)
         AS sq_norm,
       round(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_elem,
       len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS n_positive
FROM embeddings
""",
    doc="array family (higher-order functions, all JVM-side): size/index/"
    "transform+aggregate (dot-product building block)/filter",
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = F.col("embedding").cast("array<double>")
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_elem"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            ),
            4,
        ).alias("sq_norm"),
        F.round(F.array_max(emb), 6).alias("max_elem"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "fn_variant_roundtrip",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
       event_type AS meta_type,
       CAST(extract(hour FROM ts) AS INTEGER) AS meta_hour,
       round(value * 2, 4) AS val2
FROM events
""",
    doc="Spark 4.x VARIANT (open semi-structured type): typed columns "
    "-> to_json -> parse_json(VARIANT) -> variant_get typed paths "
    "(nested object + array index).  The oracle reads the SAME values "
    "straight off the base columns, so a hash match proves the "
    "variant encode/decode round-trip is lossless — the law that "
    "matters, not any engine's internal binary layout",
)
def fn_variant_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.to_json(
            F.struct(
                F.get_json_object("props", "$.k").cast("int").alias("k"),
                F.struct(
                    F.col("event_type").alias("type"),
                    F.hour("ts").alias("hour"),
                ).alias("meta"),
                F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            )
        ).alias("__j"),
    )
    v = ev.select("event_id", F.parse_json("__j").alias("__v"))
    return v.select(
        "event_id",
        F.expr("variant_get(__v, '$.k', 'int')").alias("k_val"),
        F.expr("variant_get(__v, '$.meta.type', 'string')").alias("meta_type"),
        F.expr("variant_get(__v, '$.meta.hour', 'int')").alias("meta_hour"),
        F.round(F.expr("variant_get(__v, '$.vals[1]', 'double')"), 4).alias(
            "val2"
        ),
    )
