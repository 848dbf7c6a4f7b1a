"""Multi-format ingest queries: CSV / JSON Lines / ORC round-trips
under the DuckDB oracle gate.

Each query materializes a slice of a parquet test table into a second
format with ``sources.formats``, reads it back with an explicit
schema-on-read StructType, and computes an aggregate — so the oracle
(which sees only the original parquet) certifies the WHOLE ingest path:
writer formatting, reader parsing, type round-trip (ints, doubles,
timestamps), and the PERMISSIVE quarantine plumbing returning zero
corrupt rows on clean data.

The reference ingests exactly one format (schemaless JSON over Kafka,
consumer_to_opensearch.py:56); these queries are the file-based
equivalents a standalone engine needs.  Writes go to a per-process tmp
dir and stay tiny (a filtered slice, not the table) so the bench-scale
run isn't write-bound.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import formats
from ..tables import load_table
from . import register


def _tmp(name: str, sf_dir: str = "") -> str:
    # the per-run directory must vary by SCALE as well as process:
    # cached CSV/JSON scans are keyed by (path, schema), so two sf
    # dirs sharing one path in one session would serve the first
    # scale's cached rows to the second (the plan-keyed cache hazard
    # src_csv_corrupt_recovery documents)
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8] if sf_dir else ""
    return os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_ingest_{os.getpid()}_{tag}",
        name,
    )


NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@register(
    "src_csv_ingest_nation",
    oracle="""
SELECT n_nationkey, n_name, n_regionkey FROM nation
""",
    doc="CSV ingest round-trip: nation -> RFC-4180 CSV (header, quoted) "
    "-> schema-on-read with PERMISSIVE quarantine -> all rows.  The "
    "oracle sees only the source parquet, so a hash match certifies "
    "writer+parser+types end-to-end",
)
def src_csv_ingest_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    path = _tmp("nation_csv", sf_dir)
    formats.write_csv(nation, path)
    # cache() before the quarantine split: Spark refuses plans that
    # reference ONLY the corrupt-record column from a raw CSV/JSON scan
    # (e.g. a count() after the IS NULL filter prunes everything else);
    # caching the parsed rows is the documented workaround and the slice
    # is tiny by construction.
    back = formats.valid_rows(formats.read_csv(spark, path, NATION_SCHEMA).cache())
    return back.select("n_nationkey", "n_name", "n_regionkey")


@register(
    "src_jsonl_ingest_orders",
    oracle="""
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       CAST(min(o_orderdate) AS TIMESTAMP) AS first_date,
       CAST(max(o_orderdate) AS TIMESTAMP) AS last_date
FROM orders
WHERE o_orderkey % 97 = 0
GROUP BY o_orderstatus
""",
    doc="JSON-Lines ingest round-trip: a 1/97 slice of orders -> JSONL "
    "(explicit timestamp format) -> schema-on-read -> per-status "
    "aggregate.  Certifies long/double/timestamp round-trip through "
    "text JSON against the parquet-side oracle",
)
def src_jsonl_ingest_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 97 == 0
    )
    path = _tmp("orders_jsonl", sf_dir)
    formats.write_jsonl(orders, path)
    # cache() for the same corrupt-only-pruning reason as the CSV query
    back = formats.valid_rows(formats.read_jsonl(spark, path, ORDERS_SCHEMA).cache())
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@register(
    "src_orc_ingest_part",
    oracle="""
SELECT p_brand,
       count(*) AS n_parts,
       round(avg(p_retailprice), 2) AS avg_price,
       max(p_size) AS max_size
FROM part
WHERE p_size >= 25
GROUP BY p_brand
""",
    doc="ORC ingest round-trip: part slice -> ORC (columnar, striped, "
    "self-describing) -> native read -> per-brand aggregate.  The "
    "filter is applied BEFORE the write; the post-read plan keeps "
    "column pruning (ReadSchema carries 3 of 6 columns)",
)
def src_orc_ingest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    path = _tmp("part_orc", sf_dir)
    formats.write_orc(part, path)
    back = formats.read_orc(spark, path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.max("p_size").alias("max_size"),
    )


@register(
    "dq_assertions_orders",
    oracle="""
SELECT 'orderkey_unique' AS rule,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'custkey_ref_integrity',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'status_accepted_values',
       CAST(count(*) AS BIGINT)
FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P')
UNION ALL
SELECT 'totalprice_positive',
       CAST(count(*) AS BIGINT)
FROM orders WHERE o_totalprice IS NULL OR o_totalprice <= 0
ORDER BY rule
""",
    doc="data-quality assertion suite (the dbt-test / Deequ shape): "
    "uniqueness, referential integrity (anti-join), accepted values, "
    "and range checks each reduce to one violation count; the report "
    "is their union.  Each rule scans only its pruned columns; the "
    "ref-integrity anti-join broadcasts the customer keys.  At 100 TB "
    "this is the pre-ingest gate run before anything joins the lake",
)
def dq_assertions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def one(rule: str, cnt) -> DataFrame:
        return cnt.select(
            F.lit(rule).alias("rule"), F.col("violations").cast("long")
        )

    uniq = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("violations")
    )
    ref = (
        orders.join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("violations"))
    )
    vals = orders.filter(
        ~F.col("o_orderstatus").isin("O", "F", "P")
    ).agg(F.count(F.lit(1)).alias("violations"))
    pos = orders.filter(
        F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
    ).agg(F.count(F.lit(1)).alias("violations"))
    return (
        one("orderkey_unique", uniq)
        .unionByName(one("custkey_ref_integrity", ref))
        .unionByName(one("status_accepted_values", vals))
        .unionByName(one("totalprice_positive", pos))
        .orderBy("rule")
    )
