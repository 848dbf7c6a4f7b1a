"""Similarity search over embedding columns (array<float>).

Two paths, same API:
- ``cosine_topk_bruteforce`` — exact: broadcast the (small) query set,
  map-side cosine against every vector, per-query top-k via window.
  O(N * Q * d) but embarrassingly parallel, zero fact shuffle; the
  correct baseline and the right choice when Q is small.
- ``cosine_topk_lsh`` — approximate scale path: random-hyperplane LSH
  (deterministic planes), bucket vectors by sign-bit signature, search
  only the query's bucket (+ optional multi-probe).  Turns O(N*Q) into
  O(N/2^bits * Q) at a recall cost.

Cosine is computed with zip_with + aggregate — JVM higher-order
functions, no Python in the loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
    ))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector."""
    v = F.col(vec_col).cast("array<double>")
    q = F.col(query_vec_col).cast("array<double>")
    scored = vectors.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(v, q), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-bit LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit i = 1 iff dot(vec, plane_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec, plane_col) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(bit)
    return bucket


def cosine_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    k: int = 10,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    With ``bits`` hyperplanes the expected candidate set is N / 2**bits."""
    planes = hyperplanes(dim, bits, seed)
    v = F.col(vec_col).cast("array<double>")
    q = F.col(query_vec_col).cast("array<double>")
    bucketed = vectors.withColumn("__bucket", lsh_bucket(v, planes))
    qb = queries.withColumn("__qbucket", lsh_bucket(q, planes))
    scored = bucketed.join(
        F.broadcast(qb), F.col("__bucket") == F.col("__qbucket")
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(v, q), 6).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
