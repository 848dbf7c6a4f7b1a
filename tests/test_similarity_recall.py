"""ANN quality floors: approximate paths must reach a recall@10 floor
vs the exact brute-force baseline on the driver embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
)
from aiven_challenge2_cdc_sharing_spark.tables import load_table

QUERY_IDS = [0, 1, 2, 3, 4]


def _setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = cosine_topk_bruteforce(emb, queries, k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    return emb, queries, truth


def _recall(result, truth):
    got = {}
    for r in result.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ]
    return sum(recalls) / len(recalls)


def test_multiprobe_lsh_recall_floor(spark, sf_dir):
    emb, queries, truth = _setup(spark, sf_dir)
    r = _recall(cosine_topk_lsh(emb, queries, dim=64, k=10, bits=4), truth)
    # The driver embeddings are near-isotropic (little cluster
    # structure), the worst case for sign-LSH: measured ~0.42 at
    # 4 bits/H<=1 multi-probe vs ~0.30 single-probe.  The floor pins
    # "multi-probe beats single-probe" headroom, not production recall;
    # IVF (below) is the preferred path on this geometry.
    assert r >= 0.35, f"multi-probe LSH recall@10 too low: {r}"


def test_ivf_recall_floor(spark, sf_dir):
    emb, queries, truth = _setup(spark, sf_dir)
    r = _recall(
        cosine_topk_ivf(emb, queries, k=10, n_lists=16, n_probe=4), truth
    )
    assert r >= 0.6, f"IVF recall@10 too low: {r}"


def test_bruteforce_self_is_top1(spark, sf_dir):
    emb, queries, truth = _setup(spark, sf_dir)
    exact = cosine_topk_bruteforce(emb, queries, k=1)
    for r in exact.collect():
        assert r["vec_id"] == r["query_id"] and abs(r["sim"] - 1.0) < 1e-9