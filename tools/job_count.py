"""Count Spark jobs a query triggers (build phase vs noop-sink exec).

Deterministic per-change evidence for the round-12 optimization pass:
wall seconds on this sandbox swing 1.4-1.7x with host load, but the
number of jobs a query schedules (AQE stage materializations, eager
actions, collects, checkpoint copies) is a property of the code.  Lower
job count at equal plan shape = less fixed overhead at any scale.

Usage: python tools/job_count.py q1,q2,...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.session import get_spark
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job_count")
    for t in ("customer", "orders", "lineitem", "events", "documents",
              "embeddings"):
        load_table(spark, sf_dir, t).count()
    registry = load_registry()
    st = spark.sparkContext.statusTracker()

    def njobs() -> int:
        return len(st.getJobIdsForGroup(None) or [])

    for name in names:
        j0, t0 = njobs(), time.perf_counter()
        df = registry[name].fn(spark, sf_dir)
        j1, t1 = njobs(), time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        j2, t2 = njobs(), time.perf_counter()
        print(
            f"{name}: build_jobs={j1 - j0} exec_jobs={j2 - j1} "
            f"build_s={t1 - t0:.2f} exec_s={t2 - t1:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
