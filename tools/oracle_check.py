"""Local replica of the driver's correctness gate.

Runs every registry query in Spark and its oracle SQL in DuckDB over the
same sf dir, then compares row count, column names, and an
order-insensitive value comparison (strict: exact values after
normalization, which subsumes any hash the driver uses).

Usage: python tools/oracle_check.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; both engines hand back Python floats
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(normalize_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dt.timedelta):
        return f"interval:{v.total_seconds()}"
    return f"{type(v).__name__}:{v}"


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(normalize_cell(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from aiven_challenge2_cdc_sharing_spark.queries import load_registry
    from aiven_challenge2_cdc_sharing_spark.session import get_spark

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )

    registry = load_registry()
    # $ORACLE_CHECK_SKIP: comma-separated names to skip — for sweeps at
    # scale factors where an ORACLE (not the engine) is deliberately
    # quadratic, e.g. dedup_jaccard_threshold_pairs' brute-force twin
    skip = set(filter(None, os.environ.get("ORACLE_CHECK_SKIP", "").split(",")))
    failures = []
    for name, q in sorted(registry.items()):
        if name_filter and name_filter not in name:
            continue
        if name in skip:
            print(f"skip {name} (ORACLE_CHECK_SKIP)")
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(q.oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append(name)
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            failures.append(name)
            ndiff = sum(1 for a, b in zip(cs, co) if a != b)
            print(f"FAIL {name}: {ndiff}/{len(cs)} rows differ")
            for a, b in zip(cs, co):
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
