"""Batched BPE trainer: exact parity with the sequential trainer.

The batched variant exists to bound driver round-trips (~n/batch
instead of n — at a 32k-merge vocabulary the sequential loop is 32k
Spark jobs).  Its safety argument is that every batch is a prefix of
merges the sequential trainer would make in the same order; these
tests pin that argument against the corpus fixture AND against
corpora engineered to hit the two truncation rules (symbol conflicts,
count ties at the window boundary).
"""

from __future__ import annotations

import pytest

from aiven_challenge2_cdc_sharing_spark.operators.bpe import (
    _safe_merge_batch,
    bpe_train_merges,
    bpe_train_merges_batched,
)
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def _rows(df):
    return [
        (r["merge_rank"], r["l"], r["r"], r["merged"], r["pair_count"])
        for r in df.orderBy("merge_rank").collect()
    ]


def test_batched_matches_sequential_on_fixture(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    seq = _rows(bpe_train_merges(docs, "text", n_merges=12))
    bat = _rows(bpe_train_merges_batched(docs, "text", n_merges=12, batch=8))
    assert bat == seq
    assert len(seq) == 12


@pytest.mark.parametrize("batch", [1, 2, 5, 64])
def test_batched_matches_sequential_tie_heavy(spark, batch):
    # every word repeated the same number of times -> maximal count
    # ties, forcing the strict-cutoff truncation on nearly every round
    words = ["abab", "cdcd", "abcd", "dcba", "aabb", "bbaa"]
    rows = [(" ".join(words),)] * 7
    docs = spark.createDataFrame(rows, "text string")
    seq = _rows(bpe_train_merges(docs, "text", n_merges=10))
    bat = _rows(bpe_train_merges_batched(docs, "text", n_merges=10, batch=batch))
    assert bat == seq


def test_batched_matches_sequential_chained_merges(spark):
    # 'aaaa...' makes each merge's winner depend on the previous one
    # (a+a -> aa, then aa+aa -> aaaa, ...) -> conflicts every round,
    # so the safe prefix degenerates toward batch size 1 and the
    # batched trainer must still be exact
    docs = spark.createDataFrame([("a" * 32 + " " + "b" * 16,)] * 3, "text string")
    seq = _rows(bpe_train_merges(docs, "text", n_merges=6))
    bat = _rows(bpe_train_merges_batched(docs, "text", n_merges=6, batch=4))
    assert bat == seq


def test_safe_merge_batch_conflict_and_tie_rules():
    # disjoint prefix, conflict at position 3 (shares 'b'), strict
    # cutoff kills the count-4 accepted entry that ties the conflict
    ranked = [("a", "b", 9), ("c", "d", 7), ("e", "f", 4), ("b", "x", 4)]
    assert _safe_merge_batch(ranked) == [("a", "b", 9), ("c", "d", 7)]
    # merged-token collision counts as a conflict: 'ab' + ('x','ab')
    ranked = [("a", "b", 9), ("x", "ab", 8)]
    assert _safe_merge_batch(ranked) == [("a", "b", 9)]
    # fully disjoint, no sentinel -> everything accepted
    ranked = [("a", "b", 5), ("c", "d", 5)]
    assert _safe_merge_batch(ranked) == ranked
    # run-self-merge bound: accepting (a,a,93) may create (aa,aa) up
    # to count 46, so the disjoint (b,b,45) must NOT be batched with
    # it (sequential would pick the created pair first on the tie)
    ranked = [("a", "a", 93), ("b", "b", 45)]
    assert _safe_merge_batch(ranked) == [("a", "a", 93)]
    # but a later candidate strictly above the bound is safe
    ranked = [("a", "a", 93), ("b", "b", 47)]
    assert _safe_merge_batch(ranked) == ranked
