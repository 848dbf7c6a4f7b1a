"""Round-6 scale stress: bitmap exact-distinct vs count(DISTINCT) at
synthetic row counts beyond sf0.1, and canonicalize-then-block vs
raw-row pairing for the ER levenshtein join.

Usage: python tools/stress_round6.py [n_events] [replicate_part]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f}s  ({out})")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("stress_round6")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # ---- exact distinct: n synthetic events, 1M-user id space,
    # 5 types.  The bitmap path shuffles one 63-id word per range per
    # type; count(DISTINCT) shuffles every distinct (type, user) pair.
    ev = (
        spark.range(n)
        .select(
            (F.col("id") % 5).cast("string").alias("event_type"),
            ((F.col("id") * 2654435761) % 1_000_000).alias("user_id"),
        )
        .localCheckpoint(eager=True)
    )
    timed(
        f"count(DISTINCT user_id) over {n:,} rows",
        lambda: ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0],
    )

    def bitmap():
        words = (
            ev.select(
                "event_type",
                F.expr("user_id div 63").alias("word"),
                F.expr(
                    "shiftleft(cast(1 as bigint),"
                    " cast(user_id % 63 as int))"
                ).alias("m"),
            )
            .groupBy("event_type", "word")
            .agg(F.expr("bit_or(m)").alias("bm"))
        )
        return (
            words.groupBy("event_type")
            .agg(F.sum(F.bit_count("bm")).alias("d"))
            .agg(F.sum("d"))
            .collect()[0][0]
        )

    timed(f"bitmap popcount-sum over {n:,} rows", bitmap)

    # ---- ER pairing: raw-row blocking vs canonicalize-first at
    # rep x sf0.1 part rows (same 64-name vocabulary).
    part = load_table(spark, sf_dir, "part").select("p_name")
    big = part
    for _ in range(rep - 1):
        big = big.unionAll(part)
    big = big.localCheckpoint(eager=True)
    n_part = big.count()

    def raw_pairs():
        named = big.select(
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("block"),
        )
        a, b = named.alias("a"), named.alias("b")
        return (
            a.join(
                b,
                (F.col("a.block") == F.col("b.block"))
                & (F.col("a.p_name") < F.col("b.p_name")),
            )
            .filter(
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4
            )
            .count()
        )

    def canon_pairs():
        names = big.groupBy(
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("block"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
        a, b = names.alias("a"), names.alias("b")
        return (
            a.join(
                b,
                (F.col("a.block") == F.col("b.block"))
                & (F.col("a.p_name") < F.col("b.p_name")),
            )
            .filter(
                F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 4
            )
            .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")))
            .collect()[0][0]
        )

    timed(f"canonicalize-then-block over {n_part:,} part rows", canon_pairs)
    timed(f"raw-row blocked pairs over {n_part:,} part rows", raw_pairs)


if __name__ == "__main__":
    main()
