"""sf1.0 scale point for the largest measured global windows
(round-11 verdict task 3).

`plan_audit --measure-windows` measures window INPUTS at sf0.1; four
allowlist entries exceeded 10^4 rows there and their bounded-domain /
demo-twin claims deserve a second scale point:

- sort_global_orders (150k @ sf0.1): documented demo twin of
  sort_global_ordinal_scalable — corpus-proportional BY DESIGN, the
  sf1.0 row documents the growth the annotation already admits.
- ml_conformal_interval (118.8k @ sf0.1): the window runs over the
  residual-cents histogram; bounded-domain predicts sub-linear growth
  (saturation), corpus-proportional predicts ~10x and a cap breach.
- win_percent_rank_cume / ml_systematic_sample (15k @ sf0.1): demo
  twins over the customer table, corpus-proportional but tiny.

This tool builds a 10x replica of ONLY the tables those entries load
(lineitem / orders / customer), with per-replica key offsets so keys
stay unique.  lineitem's l_extendedprice is additionally shifted by
rep*$0.07 per replica: identical replicas would contribute identical
residual cents and fake a "bounded domain" verdict, while the 7-cent
shift preserves the residual distribution's shape and lets a genuinely
sparse (unsaturated) cents domain grow — exactly the diagnostic the
bounded-domain claim needs.  If the domain were saturated, shifted
replicas would land on already-occupied cent values and the count
would stay ~flat.

Usage: python tools/stress_windows_sf1.py
Writes nothing to the repo; prints the measure-windows rows for the
four entries at the synthetic sf1.0 point (cap violations for the
documented demo twins are EXPECTED and annotated by the allowlist).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table

SRC_SF = "/root/testdata/sf0.1"
TARGETS = (
    "sort_global_orders",
    "ml_conformal_interval",
    "win_percent_rank_cume",
    "ml_systematic_sample",
)


def build(spark, out: str, mult: int = 10) -> None:
    reps = spark.range(mult).select(F.col("id").alias("__rep"))
    specs = {
        # table -> (key columns to offset, value perturbation or None)
        "orders": (["o_orderkey"], None),
        "customer": (["c_custkey"], None),
        "lineitem": (["l_orderkey"], ("l_extendedprice", 0.07)),
    }
    for table, (keys, perturb) in specs.items():
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        df = load_table(spark, SRC_SF, table).crossJoin(F.broadcast(reps))
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("__rep") * 1_000_000_000)
        if perturb is not None:
            col, step = perturb
            df = df.withColumn(
                col,
                F.round(F.col(col) + F.col("__rep") * F.lit(step), 2),
            )
        df.drop("__rep").write.mode("overwrite").parquet(dst)
        print(f"built {dst}")


def main() -> int:
    from plan_audit import measure_global_windows

    spark = get_spark("stress_windows_sf1")
    base = f"/tmp/spark_graft_sf1_windows_{os.getpid()}"
    try:
        build(spark, base)
        return measure_global_windows(base, name_filter=",".join(TARGETS))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
