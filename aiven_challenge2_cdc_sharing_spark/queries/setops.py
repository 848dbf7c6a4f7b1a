"""Set-operation surface (SURVEY.md §2.7): UNION ALL / UNION / INTERSECT
[ALL] / EXCEPT [ALL] — all stock Spark, all oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import register


def _cust_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_keys(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "set_union_all_names",
    oracle="""
SELECT n_name AS name FROM nation
UNION ALL
SELECT r_name AS name FROM region
""",
    doc="UNION ALL (bag union, no dedup shuffle)",
)
def set_union_all_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = load_table(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    regions = load_table(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    return nations.unionByName(regions)


@register(
    "set_union_distinct_nationkeys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="UNION (distinct): dedup via hash aggregate on the union",
)
def set_union_distinct_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).union(_supp_keys(spark, sf_dir)).distinct()


@register(
    "set_intersect_nationkeys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="INTERSECT (distinct semantics)",
)
def set_intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).intersect(_supp_keys(spark, sf_dir))


@register(
    "set_except_nationkeys",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="EXCEPT (distinct semantics)",
)
def set_except_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract == EXCEPT DISTINCT (exceptAll().distinct() would differ:
    # it keeps values whose left multiplicity merely exceeds the right's)
    return _cust_keys(spark, sf_dir).subtract(_supp_keys(spark, sf_dir))


@register(
    "set_except_all_multiset",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="EXCEPT ALL (multiset difference, multiplicity-aware)",
)
def set_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).exceptAll(_supp_keys(spark, sf_dir))


@register(
    "set_intersect_all_multiset",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="INTERSECT ALL (multiset intersection)",
)
def set_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_keys(spark, sf_dir).intersectAll(_supp_keys(spark, sf_dir))
