"""Deterministic, engine-reproducible sampling primitives for
training-data pipelines (SURVEY.md §2.11 / north-star LLM ops).

Spark's ``df.sample``/``sampleBy`` are seeded per-partition and NOT
stable across engines, partition counts, or re-runs with different
layouts — useless for a reproducible train/eval split at 100 TB where
the split must survive repartitioning and be re-derivable years later.
The industry answer is content hashing: bucket = md5(salt || key) and
keep a bucket range.  md5 is available and bit-identical in every
engine (Spark, DuckDB, Trino, Python), so the SAME rows land in the
same split everywhere, forever, regardless of parallelism.

Scale notes: the hash is a pure per-row codegen'd expression — no
shuffle, no state, trivially parallel at any row count.  The bucket
space (default 2^16 via the first 4 hex chars) gives 0.0015 %% split
granularity, plenty for 90/10-style cuts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BUCKETS = 1 << 16  # first 4 md5 hex chars


def hash_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 65536) from md5(salt:key).

    ``conv(hex, 16, 10)`` runs JVM-side; the salt namespaces
    independent sampling decisions (split vs mixture vs ...) so they
    are statistically independent of each other.
    """
    h = F.md5(F.concat(F.lit(salt + ":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def split_assign(key: Column, salt: str, eval_fraction: float) -> Column:
    """'train' / 'eval' label: eval iff bucket < eval_fraction * 2^16."""
    thr = int(eval_fraction * HASH_BUCKETS)
    return F.when(hash_bucket(key, salt) < thr, F.lit("eval")).otherwise(
        F.lit("train")
    )


def mixture_keep(key: Column, rate: Column, salt: str) -> Column:
    """Keep-row predicate for per-source mixture sampling: keep iff
    bucket < rate * 2^16.  ``rate`` is a per-row column (e.g. looked up
    from a source->rate map) so one scan applies every source's rate."""
    return hash_bucket(key, salt) < (rate * HASH_BUCKETS).cast("int")


def duck_hash_bucket(key_sql: str, salt: str) -> str:
    """DuckDB twin of :func:`hash_bucket` for oracle SQL — DuckDB has no
    base-16 conv(), so the 4 hex chars are positionally decoded."""
    h = f"md5('{salt}:' || CAST({key_sql} AS VARCHAR))"
    digit = "(strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1)"
    terms = " + ".join(
        f"{digit.format(h=h, i=i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )
    return f"CAST({terms} AS INTEGER)"
