"""Invariant pins for the round-11 coverage batch (coverage_round14).

The oracle gate proves value equality against DuckDB; these tests pin
the properties the oracle can't state — closed-form bounds, batch
caps, and cross-query consistency — at sf0.001.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def test_bpe_budget_bins_are_ceil_of_totals(spark, sf_dir):
    rows = (
        load_registry()["text_bpe_token_budget_bins"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows, "budget query returned no sources"
    for r in rows:
        assert r.bins == math.ceil(r.bpe_tokens / 512), r
        assert 0 < r.fill_rate <= 1.0, r
        # a word is at least one BPE token, at most its char count
        assert r.n_docs <= r.bpe_tokens, r
        assert r.max_doc_tokens >= r.median_doc_tokens, r


def test_bpe_budget_totals_match_encode_compression(spark, sf_dir):
    """Doc-grain rollup and the older per-source compression query
    tokenize the same corpus with the same trained merges — their
    per-source BPE token totals must agree exactly."""
    reg = load_registry()
    budget = {
        r.source: r.bpe_tokens
        for r in reg["text_bpe_token_budget_bins"].fn(spark, sf_dir).collect()
    }
    comp = {
        r[0]: r[1]
        for r in reg["text_bpe_encode_compression"]
        .fn(spark, sf_dir)
        .select("source", "bpe_tokens")
        .collect()
    }
    assert budget == comp


def test_ivf_serving_batch_bounded_and_k(spark, sf_dir):
    out = load_registry()["sim_ivf_serving_batch"].fn(spark, sf_dir)
    rows = out.collect()
    probes = {r.query_id for r in rows}
    # the literal cap: at most 512 probe ids at ANY scale
    assert len(probes) <= 512
    assert all(q % 25 == 0 and q < 12800 for q in probes)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= 5, (q, len(rs))
        # every served neighbor's sim is a valid cosine
        assert all(-1.000001 <= r.sim <= 1.000001 for r in rs), q


def test_int8_quantization_error_bounds(spark, sf_dir):
    """Symmetric int8 at scale mx/127: every element error is bounded
    by half a level (mx/254), so per-vector RMSE and the group's worst
    element error obey the closed form the audit exists to check."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("e")
    )
    global_mx = emb.agg(
        F.max(F.array_max(F.transform("e", lambda x: F.abs(x))))
    ).collect()[0][0]
    out = (
        load_registry()["emb_int8_quantization_error"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert out, "no labels"
    bound = global_mx / 254.0 + 1e-9
    for r in out:
        assert r.worst_abs_err <= bound, (r, bound)
        assert r.avg_rmse <= bound, r
        # int8 on 64-dim vectors barely moves direction
        assert r.avg_cosine > 0.99, r
        assert r.n_vecs > 0


def test_chunk_windows_counts_and_amplification(spark, sf_dir):
    """Per-doc chunk count has a closed form (floor((n-1)/S)+1) and
    overlap can only amplify storage: sum over the rollup must match
    the formula computed independently from the corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n")
    )
    expect_chunks = docs.select(
        (F.floor((F.col("n") - 1) / 48) + 1).alias("c")
    ).agg(F.sum("c")).collect()[0][0]
    out = (
        load_registry()["text_chunk_sliding_windows"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert sum(r.n_chunks for r in out) == expect_chunks
    for r in out:
        assert r.amplification >= 1.0 or r.n_chunks == r.n_docs, r
        assert r.full_chunks <= r.n_chunks, r
        assert 0 < r.avg_chunk_tokens <= 64, r
