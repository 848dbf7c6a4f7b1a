"""Local replica of the driver's correctness gate.

Runs every registry query in Spark and its oracle SQL in DuckDB over the
same sf dir, then compares row count, column names, and an
order-insensitive value comparison (strict: exact values after
normalization, which subsumes any hash the driver uses).

On top of the strict value compare, a DRIVER-HAZARD layer mirrors the
driver's pandas canonicalization (``toPandas()`` / ``.df()`` +
``sort_values`` + hash).  Round 2 proved the object-level compare is
blind to exactly the failures the driver reports:

* DuckDB widens ``sum(int)`` / ``list_sum`` to HUGEINT and DECIMAL sums
  to DECIMAL(38,x); ``.df()`` renders both as lossy float64 while Spark
  hands back int64 / object-Decimal — ``hash_match:false`` at the driver
  even though the Python values compare equal here.
* A top-level array/struct/map output column reaches the driver as an
  object column of lists and its ``sort_values`` canonicalizer raises
  ``unhashable type: 'list'`` -> ``err``.

The hazard layer therefore compares the *pandas dtype kind* each side
would present to the driver (Spark side derived from the Spark schema +
observed null pattern — no second job; oracle side from an actual
DuckDB ``.df()``) and fails on kind drift or unhashable columns.

Usage: python tools/oracle_check.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
import os
import sys
import time

import duckdb
import numpy as np

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


def spark_pandas_kind(dtype, has_null: bool) -> str:
    """Pandas dtype-kind a Spark column presents after toPandas().

    Arrow conversion gives: integral -> int64, but float64 once the
    column holds a null; floats -> float64; decimal -> object of
    ``decimal.Decimal``; date/timestamp -> datetime-like; array/map/
    struct -> object of list/dict (the driver-killer).
    """
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType)):
        return "unhashable"
    if isinstance(dtype, T.DecimalType):
        return "dec"
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "f" if has_null else "i"
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dtype, T.BooleanType):
        return "b"
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "M"
    if isinstance(dtype, T.StringType):
        return "S"
    if isinstance(dtype, T.BinaryType):
        return "y"
    return type(dtype).__name__


def oracle_pandas_kind(series) -> str:
    """Pandas dtype-kind of a DuckDB ``.df()`` column (driver's view)."""
    k = series.dtype.kind
    if k in "iu":
        return "i"
    if k in "fMbS":
        return {"f": "f", "M": "M", "b": "b", "S": "S"}[k]
    if k == "O":
        nn = series.dropna()
        if not len(nn):
            return "empty"
        v = nn.iloc[0]
        if isinstance(v, (list, tuple, dict, set, np.ndarray)):
            return "unhashable"
        if isinstance(v, decimal.Decimal):
            return "dec"
        if isinstance(v, bool):
            return "b"
        if isinstance(v, (dt.datetime, dt.date)):
            return "M"
        if isinstance(v, str):
            return "S"
        if isinstance(v, int):
            return "i"
        if isinstance(v, float):
            return "f"
        if isinstance(v, bytes):
            return "y"
        return type(v).__name__
    return k


def driver_hazards(sdf, srows, scols, odf) -> list[str]:
    """Mirror the driver's pandas canonicalization; return hazard list."""
    issues = []
    null_cols = {
        c: any(r[i] is None for r in srows) for i, c in enumerate(scols)
    }
    skinds = {
        f.name: spark_pandas_kind(f.dataType, null_cols.get(f.name, False))
        for f in sdf.schema.fields
    }
    for c in sorted(scols):
        sk = skinds[c]
        ok = oracle_pandas_kind(odf[c]) if c in odf.columns else "missing"
        if "unhashable" in (sk, ok):
            side = "spark" if sk == "unhashable" else "oracle"
            issues.append(
                f"{c}: {side} emits a top-level array/struct column — the "
                "driver's pandas sort_values canonicalizer raises "
                "unhashable-type (emit to_json/concat_ws strings instead)"
            )
        elif sk != ok and "empty" not in (sk, ok):
            issues.append(
                f"{c}: pandas dtype-kind drift spark={sk} oracle={ok} — "
                "driver hash compares canonical strings per-dtype "
                "(CAST integer sums to BIGINT / compare decimals as strings)"
            )
    return issues


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
    if name_filter:
        # a filter that matches nothing (e.g. a path accidentally
        # passed as argv[2], or a typo'd name) must be an ERROR — a
        # vacuous '0 failures' reads as a green gate that never ran
        matched = [
            n for n in registry
            if any(f in n for f in name_filter.split(",") if f)
        ]
        if not matched:
            print(f"ERROR: name filter {name_filter!r} matches no "
                  f"registry query — refusing the vacuous 0-failure run")
            return 2
        print(f"filter matches {len(matched)} queries")
    failures = []
    for name, q in sorted(registry.items()):
        if name_filter:
            # comma-separated list of substrings; match if ANY matches
            if not any(f in name for f in name_filter.split(",") if f):
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
            continue
        # values agree — now mirror the driver's pandas view for the
        # dtype/unhashable hazards the object-level compare can't see
        try:
            odf = con.execute(q.oracle).df()
            hazards = driver_hazards(sdf, srows, scols, odf)
        except Exception as e:  # e.g. .df() conversion itself chokes
            hazards = [f"oracle .df() conversion failed: {e}"]
        if hazards:
            failures.append(name)
            print(f"FAIL {name}: values match but DRIVER-HAZARD:")
            for h in hazards:
                print(f"  {h}")
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
