"""Semantic pins for the round-12 coverage batch (coverage_round15):
CDC-maintained IVF churn and held-out BPE fertility/OOV."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_cdc_ivf_list_churn_invariants(spark):
    from aiven_challenge2_cdc_sharing_spark.queries.coverage_round15 import (
        cdc_ivf_list_churn,
    )

    rows = cdc_ivf_list_churn(spark, SF).collect()
    assert len(rows) == 16
    assert [r["cluster"] for r in rows] == list(range(1, 17))
    # the maintained index must balance globally: total after ==
    # total before - deletes (upserts move, never change cardinality)
    t_base = sum(r["n_base"] for r in rows)
    t_del = sum(r["n_del"] for r in rows)
    t_after = sum(r["n_after"] for r in rows)
    assert t_after == t_base - t_del
    # moves balance: total departures == total arrivals
    assert sum(r["n_out"] for r in rows) == sum(r["n_in"] for r in rows)
    # per-list arithmetic identity holds row by row (n_after is
    # COUNTED from the maintained index, not derived)
    for r in rows:
        assert r["n_after"] == r["n_base"] - r["n_del"] - r["n_out"] + r["n_in"]
        assert 0.0 <= r["stay_rate"] <= 1.0
    # the drift batch is non-trivial at this SF: something was
    # deleted and something upserted
    assert t_del > 0 and sum(r["n_up"] for r in rows) > 0


def test_cdc_ivf_churn_delta_assign_touches_only_batch(spark):
    # the delta assignment input must be exactly the upsert keys —
    # maintenance is O(|batch|); pin the key arithmetic
    from aiven_challenge2_cdc_sharing_spark.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    n_up = emb.filter(
        (F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 11 != 3)
    ).count()
    assert 0 < n_up < n / 4


def test_bpe_fertility_holdout_semantics(spark):
    from aiven_challenge2_cdc_sharing_spark.queries.coverage_round15 import (
        text_bpe_fertility_oov,
    )

    rows = text_bpe_fertility_oov(spark, SF).collect()
    assert rows and sorted(r["source"] for r in rows) == [
        r["source"] for r in rows
    ]
    for r in rows:
        # every word is at least 1 token; chars/token >= 1 for
        # char-init BPE; rates are proper fractions
        assert r["fertility"] >= 1.0
        assert r["chars_per_token"] >= 1.0
        assert 0.0 <= r["novel_rate"] <= 1.0
        assert 0.0 <= r["cold_rate"] <= 1.0
        assert r["bpe_tokens"] >= r["n_words"]
        assert r["n_distinct"] <= r["n_words"]


def test_bpe_apply_merges_fixed_model(spark):
    # applying a FIXED merge list must encode exactly like the
    # leftmost-first replace semantics (the train/apply split the
    # fertility audit depends on)
    from aiven_challenge2_cdc_sharing_spark.operators.bpe import (
        BPE_SEP,
        bpe_apply_merges,
    )

    words = spark.createDataFrame(
        [("aaa", BPE_SEP.join("aaa")), ("abab", BPE_SEP.join("abab"))],
        "w string, sym string",
    )
    got = {
        r["w"]: r["n_tok"]
        for r in bpe_apply_merges(words, [("a", "a"), ("a", "b")]).collect()
    }
    # "aaa" under (a,a): leftmost-first -> "aa","a" = 2 tokens;
    # (a,b) doesn't apply
    assert got["aaa"] == 2
    # "abab" under (a,a) no-op, then (a,b) -> "ab","ab" = 2 tokens
    assert got["abab"] == 2
