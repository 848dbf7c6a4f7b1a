"""Decompose per-query wall time: DataFrame construction (Python/py4j),
driver-side analysis+optimization (explain), and execution (noop sink).

Round-12 optimization tooling (guide 1.1/1.2): before touching any
operator, know whether its seconds are plan-building, planning, or
compute.  Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_queries.py q1,q2
    python tools/profile_queries.py --all            # whole registry, sorted
    python tools/profile_queries.py q --reps 3       # median of reps

Emits one JSON line per query:
    {"query": name, "build": s, "plan": s, "exec": s, "total": s}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def profile_one(spark, sf_dir: str, name: str, fn, reps: int) -> dict:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        # analysis + optimization + physical planning, no execution
        spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        row = {
            "query": name,
            "build": round(t1 - t0, 3),
            "plan": round(t2 - t1, 3),
            "exec": round(t3 - t2, 3),
            "total": round(t3 - t0, 3),
        }
        if best is None or row["total"] < best["total"]:
            best = row
    return best


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("names", nargs="?", default=None, help="comma-separated query names")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    registry = load_registry()
    if args.all:
        names = sorted(registry)
    else:
        names = [n for n in (args.names or "").split(",") if n]
    rows = []
    for name in names:
        if name not in registry:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        try:
            row = profile_one(spark, sf_dir, name, registry[name].fn, args.reps)
        except Exception as e:  # keep going; a failure is a data point
            row = {"query": name, "error": f"{type(e).__name__}: {e}"}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.all:
        rows = [r for r in rows if "total" in r]
        rows.sort(key=lambda r: -r["total"])
        tot = sum(r["total"] for r in rows)
        bld = sum(r["build"] for r in rows)
        pln = sum(r["plan"] for r in rows)
        exe = sum(r["exec"] for r in rows)
        print(
            f"# suite totals: total={tot:.1f}s build={bld:.1f}s "
            f"plan={pln:.1f}s exec={exe:.1f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
