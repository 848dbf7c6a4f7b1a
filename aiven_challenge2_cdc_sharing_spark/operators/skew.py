"""Skew mitigation (SURVEY.md §4 / 100 TB design).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); this is
the explicit salting fallback for the cases AQE can't fix — e.g. a
single hot key whose *build* side must be replicated, or aggregations
where one group dwarfs the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact against a smaller table with key salting:
    fact rows get an arbitrary-but-join-safe salt in [0, buckets) (the
    id-derived value can differ across task retries, which is harmless
    because every salt matches exactly one dim replica); the dim side
    is replicated once per salt value, so each hot key spreads over
    ``salt_buckets`` reducers instead of one.

    Only ``inner`` and ``left`` are supported: under right/full outer,
    every unmatched dim row would surface once per replica —
    ``salt_buckets`` duplicate output rows."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full outer would emit one row per dim replica for "
            "unmatched dim keys"
        )
    salted_fact = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    replicas = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(salt_buckets - 1).cast("long")
            )
        ),
    )
    out = salted_fact.join(replicas, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation for one dominant group: count per
    (key, salt) first (spreads the hot group), then sum per key.
    Catalyst's partial aggregation usually makes this unnecessary for
    algebraic aggs; the pattern matters for non-partial-izable aggs
    (e.g. collect_list-then-process, exact distinct on huge groups)."""
    return (
        df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
        )
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("cnt"))
    )
