"""Misra-Gries heavy hitters (guarantee + exactness) and cross-doc
duplicated-span detection."""

from __future__ import annotations

import pyspark.sql.functions as F

from aiven_challenge2_cdc_sharing_spark.operators.sketches import (
    _mg_shrink,
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _skewed_items(spark, n_partitions=8):
    # adversarial mix: 3 true heavy hitters buried in a long uniform
    # tail that would dominate a naive groupBy's shuffle
    rows = (
        [("hot_a",)] * 4000
        + [("hot_b",)] * 2500
        + [("hot_c",)] * 1200
        + [(f"tail_{i % 900}",) for i in range(2300)]
    )
    return spark.createDataFrame(rows, "item string").repartition(n_partitions)


def test_heavy_hitters_exact_matches_groupby(spark):
    items = _skewed_items(spark)
    k = 100
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters_exact(items, "item", k=k).collect()
    }
    n = items.count()
    want = {
        r["item"]: r["c"]
        for r in items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > n / k)
        .collect()
    }
    assert got == want
    assert set(got) == {"hot_a", "hot_b", "hot_c"}
    assert got["hot_a"] == 4000


def test_mg_candidates_bounded_and_superset(spark):
    items = _skewed_items(spark, n_partitions=8)
    k = 100
    cand = set(
        r["item"]
        for r in misra_gries_candidates(items, "item", capacity=k - 1).collect()
    )
    # candidate set is bounded by capacity * partitions, not by the
    # distinct universe (903 here)
    assert len(cand) <= (k - 1) * 8
    assert {"hot_a", "hot_b", "hot_c"} <= cand


def test_heavy_hitters_non_string_items_and_nulls(spark):
    """ADVICE r02: the mapInPandas schema must carry the INPUT dtype
    (not hardcoded string) and null items are excluded explicitly."""
    rows = [(7,)] * 500 + [(13,)] * 310 + [(None,)] * 400
    rows += [(i,) for i in range(100, 200)]
    items = spark.createDataFrame(rows, "item int").repartition(4)

    cand = misra_gries_candidates(items, "item", capacity=9)
    # dtype survives the round-trip: int stays int
    assert cand.schema["item"].dataType.typeName() == "integer"
    cvals = {r["item"] for r in cand.collect()}
    assert 7 in cvals and 13 in cvals
    assert None not in cvals

    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters_exact(items, "item", k=3).collect()
    }
    # threshold is over NON-NULL N (910): 7 (500) and 13 (310) clear
    # N/3; nulls are neither candidates nor part of the denominator
    assert got == {7: 500, 13: 310}


def test_mg_shrink_merge_rule():
    c = _mg_shrink({"a": 10, "b": 7, "c": 3, "d": 1}, capacity=2)
    # cut = 3rd largest (3): a->7, b->4, c,d dropped
    assert c == {"a": 7, "b": 4}
    assert _mg_shrink({"a": 2}, capacity=2) == {"a": 2}


def test_dup_ngram_spans_known_overlap(spark, tmp_path):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = [
        (0, f"{shared} unique tail zero one two three four five six seven"),
        (1, f"prefix words here {shared} and a different ending entirely now"),
        (2, "completely unrelated content with no duplicated spans at all ok"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from aiven_challenge2_cdc_sharing_spark.queries.llm_ops import (
        text_dup_ngram_spans,
    )

    out = {r["doc_id"]: r for r in text_dup_ngram_spans(spark, str(tmp_path)).collect()}
    # the shared 8-gram covers exactly its 8 tokens in both docs
    assert out[0]["n_dup_grams"] == 1 and out[0]["dup_tokens"] == 8
    assert out[1]["n_dup_grams"] == 1 and out[1]["dup_tokens"] == 8
    assert out[2]["n_dup_grams"] == 0 and out[2]["dup_tokens"] == 0
    assert out[2]["flagged"] is False
    # doc 0 has 18 tokens -> 8/18 > 0.2 => flagged
    assert out[0]["flagged"] is True


def test_dup_ngram_spans_interval_union(spark, tmp_path):
    # two OVERLAPPING duplicated grams (positions 1 and 2) must count
    # 9 covered tokens, not 16 — the interval union, not the sum
    nine = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    docs = [
        (0, f"{nine} tail0 a b c d e f g h i"),
        (1, f"{nine} tail1 j k l m n o p q r"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from aiven_challenge2_cdc_sharing_spark.queries.llm_ops import (
        text_dup_ngram_spans,
    )

    out = {r["doc_id"]: r for r in text_dup_ngram_spans(spark, str(tmp_path)).collect()}
    assert out[0]["n_dup_grams"] == 2
    assert out[0]["dup_tokens"] == 9


def test_mg_shrink_guarantee_property():
    """Property (Misra-Gries invariant, checked purely on the shrink
    rule): after shrinking a counter multiset to capacity k, any item
    whose true count exceeds (total - residual_total) ... i.e. the
    classic bound: count error per item <= (total decremented) <=
    total/(k+1).  Random multisets, no Spark needed."""
    import random

    rng = random.Random(42)
    for _ in range(200):
        k = rng.randint(1, 8)
        universe = [f"t{i}" for i in range(rng.randint(1, 30))]
        stream = [rng.choice(universe) for _ in range(rng.randint(1, 400))]
        # exact counts
        exact: dict = {}
        for t in stream:
            exact[t] = exact.get(t, 0) + 1
        # streaming MG via repeated merge of singleton batches
        counters: dict = {}
        for t in stream:
            counters[t] = counters.get(t, 0) + 1
            counters = _mg_shrink(counters, k)
        n = len(stream)
        # every item with count > n/(k+1) must survive
        for t, c in exact.items():
            if c > n / (k + 1):
                assert t in counters, (t, c, n, k, counters)
        # MG counters never overcount
        for t, c in counters.items():
            assert c <= exact[t]


def test_cluster_safe_split_no_leakage(spark, sf_dir):
    """The property the operator exists for: no near-dup cluster is
    divided across train/eval.  Also demonstrate the hazard is real —
    with synthetic multi-doc clusters, a naive per-doc hash split DOES
    divide some cluster (eval contamination)."""
    import pyspark.sql.functions as F

    from aiven_challenge2_cdc_sharing_spark.operators.clustering import (
        dedup_clusters,
    )
    from aiven_challenge2_cdc_sharing_spark.operators.sampling import (
        split_assign,
    )

    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    # 100 clusters of 4 consecutive ids each
    pairs = spark.sql(
        """SELECT id * 4 + j AS id_a, id * 4 + j + 1 AS id_b
           FROM range(100) CROSS JOIN (SELECT explode(sequence(0, 2)) j)"""
    )
    clusters = dedup_clusters(docs, pairs)
    out = clusters.select(
        "doc_id",
        "cluster_id",
        split_assign(F.col("cluster_id"), "csplit", 0.1).alias("split"),
        split_assign(F.col("doc_id"), "csplit", 0.1).alias("naive_split"),
    )
    per_cluster = out.groupBy("cluster_id").agg(
        F.count_distinct("split").alias("n_safe"),
        F.count_distinct("naive_split").alias("n_naive"),
    )
    assert per_cluster.filter(F.col("n_safe") > 1).count() == 0
    # the hazard is real: at 10% eval over 100 4-doc clusters, some
    # cluster is split by the per-doc hash with overwhelming odds
    assert per_cluster.filter(F.col("n_naive") > 1).count() > 0


def _bpe_reference(words: list[str], k: int):
    """Plain-Python BPE trainer: same argmax + leftmost-merge rules."""
    from collections import Counter

    freq = Counter(words)
    vocab = {w: list(w) for w in freq}
    out = []
    for rank in range(k):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, l + r, cnt))
        for w, syms in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            vocab[w] = merged
    return out


def test_bpe_train_matches_reference_and_tiebreak(spark):
    from aiven_challenge2_cdc_sharing_spark.operators.bpe import (
        bpe_train_merges,
    )

    # merged symbols must feed later rounds: "aaa" learns (a,a) then (aa,a)
    corpora = [
        "low low low lower lower newest newest newest newest".split(),
        ["aaa", "aaa", "ab", "ab", "cd", "cd"],  # tie (a,b) vs (c,d) -> lexicographic
    ]
    for words in corpora:
        docs = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
        )
        got = [
            (r["merge_rank"], r["l"], r["r"], r["merged"], r["pair_count"])
            for r in bpe_train_merges(docs, "text", n_merges=4)
            .orderBy("merge_rank")
            .collect()
        ]
        assert got == _bpe_reference(words, 4), words


def test_bpe_encode_compression_matches_reference(spark):
    from aiven_challenge2_cdc_sharing_spark.operators.bpe import (
        bpe_encode_stats,
    )

    words = "low low low lower lower newest newest newest newest".split()
    docs = spark.createDataFrame(
        [(i, w, "s1" if i % 2 == 0 else "s2") for i, w in enumerate(words)],
        "doc_id int, text string, source string",
    )
    got = {
        r["source"]: (r["bpe_tokens"], r["n_chars"], r["chars_per_token"])
        for r in bpe_encode_stats(docs, "text", "source", n_merges=4).collect()
    }
    # python reference: train on full corpus, encode each occurrence
    merges = _bpe_reference(words, 4)
    def encode(w):
        syms = list(w)
        for _, l, r, _, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return len(syms)
    import collections
    expect = collections.defaultdict(lambda: [0, 0])
    for i, w in enumerate(words):
        src = "s1" if i % 2 == 0 else "s2"
        expect[src][0] += encode(w)
        expect[src][1] += len(w)
    for src, (tok, chars) in expect.items():
        assert got[src][0] == tok and got[src][1] == chars, src
        assert got[src][2] == round(chars / tok, 6)
    # BPE merges only ever shrink the token count vs characters
    assert all(v[2] >= 1.0 for v in got.values())
