"""Benchmark harness (driver contract).

Runs the full query registry at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, nothing
collected to the driver), after a small warmup to absorb JVM/codegen
startup — so per-query numbers reflect steady-state engine throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def _stream_cdc_e2e(spark, sf_dir: str) -> float:
    import shutil
    import tempfile

    from aiven_challenge2_cdc_sharing_spark.cdc import generate_envelope_log
    from aiven_challenge2_cdc_sharing_spark.streaming import (
        envelope_file_stream,
        read_snapshot,
        run_snapshot_maintenance,
    )

    d = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        generate_envelope_log(spark, sf_dir).repartition(8).write.json(f"{d}/ev")
        t0 = time.perf_counter()
        q = run_snapshot_maintenance(
            envelope_file_stream(spark, f"{d}/ev"), f"{d}/snap", f"{d}/ck"
        )
        q.awaitTermination(600)
        read_snapshot(spark, f"{d}/snap").write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # warmup: touch every table + one tiny agg so codegen/JIT costs don't
    # land on the first measured query
    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).count()

    registry = load_registry()
    timings: dict[str, float] = {}
    for name, q in sorted(registry.items()):
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a failing query must not kill the bench
            print(f"bench: {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
            timings[name] = -1.0

    # end-to-end streaming CDC: envelope JSON -> file stream ->
    # foreachBatch MERGE -> published snapshot (wall seconds)
    timings["stream_cdc_snapshot_e2e"] = round(_stream_cdc_e2e(spark, sf_dir), 3)

    total = round(sum(t for t in timings.values() if t >= 0), 2)
    # The driver captures a bounded tail of stdout and must be able to
    # json-parse the final line (BENCH_r01 had parsed:null because the
    # round-1 line overflowed that buffer).  Keep the line as short as
    # possible: compact separators, 2-decimal timings, nothing else on
    # stdout (all logs go to stderr).
    line = json.dumps(
        {
            "metric": "registry_suite_seconds",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in timings.items()},
            "sf": sf,
        },
        separators=(",", ":"),
    )
    print(f"bench: final JSON line is {len(line)} bytes", file=sys.stderr)
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
