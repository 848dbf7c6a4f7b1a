"""Round-8 scale stress: (a) two-level bucketed lag vs a global
single-partition window over a synthetic change log far beyond sf0.1;
(b) derived-bits LSH candidate volume vs the fixed-16-bucket code for
the hubness/density candidate joins; (c) PQ-ADC scoring vs exact
brute-force dot top-k on a synthetic embedding corpus.

Usage: python tools/stress_round8.py [n_log_rows] [n_vectors]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.session import get_spark


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label}: {time.time() - t0:.2f}s  ({out})")


def main():
    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_vec = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("stress_round8")

    # ---- (a) inter-event lag: global window vs two-level bucketed.
    # Synthetic log: monotone-ish commit times with jitter so gaps vary.
    log = (
        spark.range(n_log)
        .select(
            (
                F.col("id") * 1000
                + (F.col("id") * 2654435761) % 997
            ).alias("rel_ms"),
            (F.col("id") % 3).cast("string").alias("op"),
        )
        .localCheckpoint(eager=True)
    )

    def global_lag():
        w = Window.orderBy("rel_ms", "op")
        gaps = log.select(
            "op", (F.col("rel_ms") - F.lag("rel_ms").over(w)).alias("g")
        ).filter(F.col("g").isNotNull())
        return gaps.agg(F.sum("g")).collect()[0][0]

    def two_level_lag():
        lg = log.withColumn(
            "bkt", (F.col("rel_ms") / 1_000_000_0).cast("long")
        )
        w_in = Window.partitionBy("bkt").orderBy("rel_ms", "op")
        within = lg.withColumn(
            "g", F.col("rel_ms") - F.lag("rel_ms").over(w_in)
        )
        stats = lg.groupBy("bkt").agg(
            F.min("rel_ms").alias("bmin"), F.max("rel_ms").alias("bmax")
        )
        w_b = Window.orderBy("bkt")
        boundary = stats.select(
            "bkt", (F.col("bmin") - F.lag("bmax").over(w_b)).alias("bg")
        )
        gaps = (
            within.filter(F.col("g").isNotNull())
            .select("g")
            .unionByName(
                within.filter(F.col("g").isNull())
                .join(F.broadcast(boundary), "bkt")
                .filter(F.col("bg").isNotNull())
                .select(F.col("bg").alias("g"))
            )
        )
        return gaps.agg(F.sum("g")).collect()[0][0]

    timed(f"global-window lag over {n_log:,} rows", global_lag)
    timed(f"two-level bucketed lag over {n_log:,} rows", two_level_lag)

    # ---- (b) LSH candidate volume: fixed 4 bits vs derived bits.
    dim = 64
    vecs = (
        spark.range(n_vec)
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (
                        (F.col("id") * (2654435761 + i * 40503) % 10007)
                        / 10007.0
                        - 0.5
                    )
                    for i in range(dim)
                ]
            ).alias("e"),
        )
        .localCheckpoint(eager=True)
    )

    def cand_count(bits: int):
        b = vecs.select(
            "vec_id",
            sum(
                F.when(F.element_at(F.col("e"), i + 1) > 0, 1 << i)
                .otherwise(0)
                for i in range(bits)
            ).alias("bucket"),
        ).localCheckpoint(eager=True)
        probes = b.select(
            "vec_id",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(bits)
                    ],
                )
            ).alias("bucket"),
        )
        v = b.select(F.col("vec_id").alias("nb"), "bucket")
        return (
            probes.join(v, "bucket")
            .filter(F.col("nb") != F.col("vec_id"))
            .count()
        )

    derived = min(16, max(4, math.ceil(math.log2(n_vec / 128.0))))
    timed(f"candidates at fixed 4 bits, n={n_vec:,}", lambda: cand_count(4))
    timed(
        f"candidates at derived {derived} bits, n={n_vec:,}",
        lambda: cand_count(derived),
    )

    # ---- (c) PQ-ADC scoring vs exact dot top-k for 3 probe vectors.
    def exact_topk():
        q = vecs.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("e").alias("qe")
        )
        scored = vecs.crossJoin(F.broadcast(q)).select(
            "qid",
            "vec_id",
            F.aggregate(
                F.zip_with("e", "qe", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
        )
        w = Window.partitionBy("qid").orderBy(F.desc("s"), "vec_id")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .count()
        )

    def pq_adc():
        m_sub, sub = 4, 16
        dims = vecs.select(
            "vec_id", F.posexplode("e").alias("p0", "x")
        ).select(
            "vec_id",
            (F.col("p0") / sub).cast("int").alias("m"),
            (F.col("p0") % sub).alias("p"),
            "x",
        ).localCheckpoint(eager=True)
        c0 = dims.filter(F.col("vec_id") < 4).select(
            "m", F.col("vec_id").alias("k"), "p", F.col("x").alias("c")
        )
        d1 = (
            dims.join(F.broadcast(c0), ["m", "p"])
            .groupBy("vec_id", "m", "k")
            .agg(
                F.sum(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ).alias("d2")
            )
        )
        wa = Window.partitionBy("vec_id", "m").orderBy("d2", "k")
        codes = (
            d1.withColumn("rn", F.row_number().over(wa))
            .filter(F.col("rn") == 1)
            .select("vec_id", "m", F.col("k").alias("code"))
        )
        c1 = (
            codes.join(dims, ["vec_id", "m"])
            .groupBy("m", F.col("code").alias("k"), "p")
            .agg(F.avg("x").alias("c"))
        )
        lut = (
            dims.filter(F.col("vec_id") < 3)
            .join(F.broadcast(c1), ["m", "p"])
            .groupBy(F.col("vec_id").alias("qid"), "m", "k")
            .agg(F.sum(F.col("x") * F.col("c")).alias("pdot"))
        )
        adc = (
            codes.alias("cd")
            .join(
                F.broadcast(lut.alias("l")),
                (F.col("l.m") == F.col("cd.m"))
                & (F.col("l.k") == F.col("cd.code")),
            )
            .groupBy("l.qid", "cd.vec_id")
            .agg(F.sum("l.pdot").alias("s"))
        )
        w = Window.partitionBy("qid").orderBy(F.desc("s"), "vec_id")
        return (
            adc.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .count()
        )

    timed(f"exact dot top-5, 3 probes x {n_vec:,} vectors", exact_topk)
    timed(f"PQ-ADC top-5 (train+encode+score), {n_vec:,} vectors", pq_adc)


if __name__ == "__main__":
    main()
