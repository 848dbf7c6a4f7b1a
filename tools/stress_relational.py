"""Relational-path stress: replicate sf0.1 lineitem/orders 10x-100x.

SCALING.md's cross-SF table shows the sf sweep is overhead-bound (a
100x data increase moves wall ~1x), so it cannot distinguish a plan
that scales from one that merely fits in the noise floor.  This
harness pushes the two canonical shapes — Q1 scan+aggregate and the
orders x lineitem shuffle join + aggregate — into the data-bound
regime on one box: 600k -> 6M -> 60M lineitem rows (60M x ~100 B is
~6 GB of fact, far past the 32-thread overhead floor).

Replication preserves join fan-out: both tables offset their order
keys by replica * 10^9, so each orders replica joins exactly its own
lineitem replica (per-key multiplicity identical to sf0.1 — row counts
scale, skew does not).

Usage: python tools/stress_relational.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def _replicate(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    reps = df.sparkSession.range(k).select(F.col("id").alias("__rep"))
    out = df.crossJoin(F.broadcast(reps))
    for c in key_cols:
        out = out.withColumn(c, F.col(c) + F.col("__rep") * 1_000_000_000)
    return out.drop("__rep")


def q1_shape(lineitem: DataFrame) -> DataFrame:
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def join_shape(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_extendedprice").alias("revenue"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark()
    base_li = load_table(spark, sf_dir, "lineitem")
    base_or = load_table(spark, sf_dir, "orders")

    print("| shape | lineitem rows | wall | rows/s |")
    print("|---|---|---|---|")
    for k in (1, 10, 100):
        # no checkpoint: materializing 60M replicated rows would eat
        # the 8g driver heap, and the replication is a map-side
        # broadcast crossJoin — including it in the wall mirrors the
        # "scan the fact table" cost the shapes are supposed to pay
        li = _replicate(base_li, ["l_orderkey"], k)
        orders = _replicate(base_or, ["o_orderkey"], k)
        n = li.count()
        for name, fn in (
            ("Q1 scan+agg", lambda: q1_shape(li)),
            ("orders x lineitem join+agg", lambda: join_shape(orders, li)),
        ):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            print(
                f"| {name} ({k}x) | {n:,} | {dt:.1f} s | {n/dt/1e6:.1f} M |",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
