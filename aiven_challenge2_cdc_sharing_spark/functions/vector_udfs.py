"""Pandas-UDF surface (SURVEY.md §2.10).

The engine's rule: built-in JVM expressions first; when Python is
genuinely needed (numpy/vectorized math, external libraries), it must
be Arrow-batched — scalar ``pandas_udf``, grouped ``applyInPandas`` —
never row-at-a-time ``udf``.  The reference's consumer loop
(consumer_to_opensearch.py:67-96) is morally a row-at-a-time UDF; these
are its vectorized replacements.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_cosine_udf(query_vec: list[float]):
    """Scalar pandas_udf: cosine similarity of every row's embedding
    against a fixed query vector.  One numpy matmul per Arrow batch —
    the classic 10-100x win over per-row Python."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @F.pandas_udf(T.DoubleType())
    def cosine_to_query(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.apply(lambda v: np.asarray(v, dtype=np.float64)))
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
        return pd.Series(sims)

    return cosine_to_query


@F.pandas_udf(T.DoubleType())
def pairwise_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Two-column scalar pandas_udf: row-wise cosine(a_i, b_i) for a
    whole Arrow batch at once (einsum row-dot + vectorized norms).

    This is the shape that keeps a multi-query similarity scan single-
    pass: crossJoin the fact table with the *broadcast* query set and
    score each (vector, query) row here — no driver-side collect of
    query vectors, no per-query plan branch, plan size O(1) in the
    number of queries."""
    mat_a = np.stack(a.apply(lambda v: np.asarray(v, dtype=np.float64)))
    mat_b = np.stack(b.apply(lambda v: np.asarray(v, dtype=np.float64)))
    num = np.einsum("ij,ij->i", mat_a, mat_b)
    denom = np.linalg.norm(mat_a, axis=1) * np.linalg.norm(mat_b, axis=1)
    return pd.Series(num / denom)


@F.pandas_udf(T.DoubleType())
def mean_vector_norm(emb: pd.Series) -> float:
    """GROUPED-AGG pandas_udf (Series -> scalar): mean L2 norm of a
    group's embeddings, one numpy reduction per group.  Per-row norms
    are rounded to 6dp before averaging so the cross-engine oracle
    compare is immune to summation-order last-bit drift."""
    mat = np.stack(emb.apply(lambda v: np.asarray(v, dtype=np.float64)))
    return float(np.sqrt((mat * mat).sum(axis=1)).round(6).mean())


def label_centroids(embeddings: DataFrame, vec_col: str = "embedding",
                    label_col: str = "label", dim: int = 64) -> DataFrame:
    """Grouped-map applyInPandas: per-label mean vector (centroid).

    Arrow moves each group as one batch; numpy reduces it.  At scale
    the shuffle is by label (small cardinality) — for skewed labels,
    pre-aggregate partial sums per partition first (same pattern as
    salted aggregation)."""
    out_schema = T.StructType(
        [
            T.StructField("label", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("centroid", T.ArrayType(T.DoubleType())),
        ]
    )

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].apply(lambda v: np.asarray(v, dtype=np.float64)))
        return pd.DataFrame(
            {
                "label": [int(pdf[label_col].iloc[0])],
                "n": [len(pdf)],
                "centroid": [mat.mean(axis=0).tolist()],
            }
        )

    return embeddings.groupBy(label_col).applyInPandas(centroid, out_schema)
