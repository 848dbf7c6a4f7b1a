"""sf1.0 stress point for the heavy embedding/LSH query family
(VERDICT r7 task 4).

The four slowest bench timings — emb_triplet_margin_stats,
emb_hubness_indegree, emb_two_nn_intrinsic_dim,
emb_density_core_points — all share the derived-bits sign-LSH
candidate discipline (code width grows with corpus size so the
expected bucket stays ~128 rows; hot buckets capped at 8x expected).
Their linearity claim rested on design analysis plus sf<=0.1
measurements (N=2,000 vectors).  This tool measures the claim: it
replicates the sf0.1 corpus Mx (deterministic per-replica jitter then
re-normalization, so the label-cluster structure that drives bucket
occupancy is preserved) and times each query at N=2k and N=20k
("sf1.0"; pass more multipliers for further points), reporting the
wall-clock scaling exponent log(t_M/t_1)/log(M) — ~1.0 = linear.

Usage: python tools/stress_sf1_embeddings.py [multipliers] [query_filter]
       (default "1,10"; e.g. "1,10,30"; query_filter is a
       comma-separated substring filter over QUERIES)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table

SRC_SF = "/root/testdata/sf0.1"
# registry defaults are the BLAS cogroup scorers since round 9; each
# *_hof twin is the oracle-exact sequential-fold reference path and is
# parity-asserted against its registry row at every multiplier
QUERIES = [
    "emb_density_core_points",
    "emb_density_core_points_hof",
    "emb_hubness_indegree",
    "emb_hubness_indegree_hof",
    "emb_two_nn_intrinsic_dim",
    "emb_two_nn_intrinsic_dim_hof",
    "emb_triplet_margin_stats",
    "emb_triplet_margin_stats_hof",
    "ml_knn_classify",
    "ml_knn_classify_hof",
    # round-10: the IVF search path (verdict task 4 asks whether its
    # in-cell HOF scoring needs the BLAS treatment — measure first)
    "sim_cosine_topk_ivf",
]

# the brute-force kNN HOF twin is O(n_test * n_train) per-pair folds —
# ~17 min at m=10 — so its parity pin runs at the base multiplier only;
# the BLAS registry default (same work as 32 dgemms) runs at every m
BASE_MULT_ONLY = {"ml_knn_classify_hof"}


def build_corpus(spark, mult: int, base_dir: str) -> str:
    """Write an embeddings.parquet with mult x the sf0.1 vectors.

    Replica r of vector v gets a deterministic jitter (xxhash of
    (vec_id, r, dim), scaled to ~1.5% of a unit vector) and is then
    re-normalized, so replicas land NEAR the original — same cluster
    geometry, same sign-bit bucket pressure — without being exact
    duplicates (sim 1.0 rows are excluded by the two-NN query).
    """
    out = os.path.join(base_dir, f"m{mult}")
    if os.path.exists(os.path.join(out, "embeddings.parquet")):
        return out
    emb = load_table(spark, SRC_SF, "embeddings")
    n_base = emb.count()
    reps = spark.range(mult).select(F.col("id").cast("int").alias("rep"))
    jittered = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep").cast("long") * n_base).alias(
                "vec_id"
            ),
            "label",
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + F.when(F.col("rep") == 0, F.lit(0.0)).otherwise(
                    (
                        (
                            F.xxhash64(
                                F.col("vec_id"), F.col("rep"), i
                            )
                            % 1000
                        ).cast("double")
                        / 1000.0
                    )
                    * 0.002
                ),
            ).alias("e_raw"),
        )
        .select(
            "vec_id",
            "label",
            F.sqrt(
                F.aggregate(
                    "e_raw",
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ).alias("nrm"),
            "e_raw",
        )
        .select(
            "vec_id",
            F.transform(
                "e_raw", lambda x: (x / F.col("nrm")).cast("float")
            ).alias("embedding"),
            "label",
        )
    )
    jittered.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return out


def main() -> int:
    mults = [
        int(m)
        for m in (sys.argv[1] if len(sys.argv) > 1 else "1,10").split(",")
    ]
    queries = QUERIES
    if len(sys.argv) > 2 and sys.argv[2]:
        pats = [p for p in sys.argv[2].split(",") if p]
        queries = [q for q in QUERIES if any(p in q for p in pats)]
        if not queries:
            print(f"query filter {sys.argv[2]!r} matches nothing")
            return 1
    from aiven_challenge2_cdc_sharing_spark.queries import load_registry

    spark = get_spark("stress_sf1_embeddings")
    registry = load_registry()
    base = f"/tmp/spark_graft_sf1_stress_{os.getpid()}"
    walls: dict[str, dict[int, float]] = {q: {} for q in queries}
    rows: dict[int, int] = {}
    for m in mults:
        sf_dir = build_corpus(spark, m, base)
        rows[m] = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).count()
        print(f"-- corpus m={m}: {rows[m]} vectors")
        from aiven_challenge2_cdc_sharing_spark.queries import (
            coverage_round6 as _cr6,
        )
        from aiven_challenge2_cdc_sharing_spark.queries import (
            coverage_round8 as _cr8,
        )
        from aiven_challenge2_cdc_sharing_spark.queries import (
            coverage_round5 as _cr5,
        )
        from aiven_challenge2_cdc_sharing_spark.queries import (
            coverage_round9 as _cr9,
        )

        hof_twins = {
            "emb_density_core_points_hof": _cr6._density_core_points_hof,
            "emb_hubness_indegree_hof": _cr8._hubness_hof,
            "emb_two_nn_intrinsic_dim_hof": _cr9._two_nn_hof,
            "emb_triplet_margin_stats_hof": _cr9._triplet_hof,
            "ml_knn_classify_hof": _cr5._ml_knn_classify_hof,
        }
        outs: dict[str, list] = {}
        for q in queries:
            if q in BASE_MULT_ONLY and m != mults[0]:
                continue
            fn = hof_twins.get(q) or registry[q].fn
            t0 = time.time()
            out = fn(spark, sf_dir).collect()
            dt = time.time() - t0
            walls[q][m] = dt
            outs[q] = sorted(tuple(r) for r in out)
            print(f"   {q}: {dt:.2f}s ({len(out)} result rows)")
        # round-8 verdict task 7 protocol: promotion evidence is parity
        # AT THE STRESS POINT, not just at sf0.1 (registry defaults are
        # the BLAS scorers since round 9; each HOF twin is the
        # oracle-exact reference)
        for tq in hof_twins:
            reg_name = tq[: -len("_hof")]
            if tq in outs and reg_name in outs:
                print(
                    f"   blas/hof parity at m={m} [{reg_name}]: "
                    f"exact={outs[reg_name] == outs[tq]}"
                )
    m0 = mults[0]
    print("\n| query | " + " | ".join(f"N={rows[m]}" for m in mults)
          + " | exponent |")
    print("|---|" + "---|" * (len(mults) + 1))
    for q in queries:
        expo = ""
        m1 = mults[-1]
        if len(mults) > 1 and m1 in walls[q]:
            expo = f"{math.log(walls[q][m1] / walls[q][m0]) / math.log(m1 / m0):.2f}"
        cells = " | ".join(
            f"{walls[q][m]:.2f} s" if m in walls[q] else "(base-mult only)"
            for m in mults
        )
        print(f"| {q} | {cells} | {expo} |")
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
