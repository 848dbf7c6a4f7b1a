"""Input-scaling exponents for the dedup pair-join registry trio
(round-9 verdict task 5).

`dedup_containment_pairs`, `dedup_minhash_near_pairs`, and
`dedup_jaccard_threshold_pairs` are the heaviest non-embedding
registry queries; their posting-list / banded-LSH / df-cap designs
predate the measured-exponent discipline (tools/stress_dedup.py is
REPLICATION stress — near-dup replicas, so true pairs and therefore
any correct operator's output grow ~K^2, which conflates output
growth with input growth).

This harness isolates INPUT scaling: EVERY replica (including rep 0)
gets every token suffixed with a replica-unique marker ('zq<r>'), so
replicas are pairwise DISJOINT shingle universes by construction — cross-replica similarity is zero, true
pairs grow ~K (each replica reproduces the base corpus's internal
dup structure), and each shingle's document frequency is unchanged
(a suffixed shingle lives only in its replica).  The df-cap therefore
faces K independent copies of the same df distribution and the
candidate join volume sum(df^2) grows linearly in K.  A wall exponent
near 1.0 (sub-quadratic) is the claim under test; ~2.0 would mean the
pair machinery does all-pairs work the cap fails to prune.

Queries run as their REGISTRY entries (same code the driver hashes),
pointed at a replicated corpus directory.

Usage: python tools/stress_pairjoins.py [multipliers] [query_filter]
       (default "1,10": 5,000 -> 50,000 docs at sf0.1)
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
QUERIES = [
    "dedup_minhash_near_pairs",
    "dedup_jaccard_threshold_pairs",
    "dedup_containment_pairs",
]


def build_corpus(spark, mult: int, base_dir: str) -> str:
    """documents.parquet with mult x the sf0.1 docs, disjoint replicas."""
    out = os.path.join(base_dir, f"m{mult}")
    if os.path.exists(os.path.join(out, "documents.parquet")):
        return out
    docs = load_table(spark, SRC_SF, "documents")
    reps = spark.range(mult).select(F.col("id").alias("__rep"))
    replicated = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("__rep") * 1_000_000_000).alias("doc_id"),
        # suffix EVERY token in EVERY replica (including rep 0 — a base
        # token naturally ending in 'zq<digits>' would otherwise collide
        # with a suffixed replica's universe; round-10 advice item):
        # replica shingle universes are disjoint by construction,
        # per-shingle df is preserved within each replica
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit(r"$1zq"), F.col("__rep").cast("string")),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    replicated.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
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

    spark = get_spark("stress_pairjoins")
    registry = load_registry()
    base = f"/tmp/spark_graft_pairjoin_stress_{os.getpid()}"
    walls: dict[str, dict[int, float]] = {q: {} for q in queries}
    outs: dict[str, dict[int, int]] = {q: {} for q in queries}
    rows: dict[int, int] = {}
    for m in mults:
        sf_dir = build_corpus(spark, m, base)
        rows[m] = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        print(f"-- corpus m={m}: {rows[m]} docs")
        for q in queries:
            t0 = time.time()
            n_out = registry[q].fn(spark, sf_dir).count()
            dt = time.time() - t0
            walls[q][m] = dt
            outs[q][m] = n_out
            print(f"   {q}: {dt:.2f}s ({n_out} pairs)", flush=True)
    m0, m1 = mults[0], mults[-1]
    print("\n| query | " + " | ".join(f"N={rows[m]}" for m in mults)
          + " | pairs@base->top | exponent |")
    print("|---|" + "---|" * (len(mults) + 2))
    for q in queries:
        expo = ""
        if len(mults) > 1 and m1 in walls[q]:
            expo = (
                f"{math.log(walls[q][m1] / walls[q][m0]) / math.log(m1 / m0):.2f}"
            )
        cells = " | ".join(f"{walls[q][m]:.2f} s" for m in mults)
        print(f"| {q} | {cells} | {outs[q][m0]}->{outs[q][m1]} | {expo} |")
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
