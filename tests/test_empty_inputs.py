"""Degenerate-input robustness: core operators must behave on empty
logs/tables (the state of every pipeline at t=0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.cdc import (
    apply_changes,
    generate_envelope_log,
    latest_snapshot,
    unwrap,
)
from aiven_challenge2_cdc_sharing_spark.operators.clustering import dedup_clusters
from aiven_challenge2_cdc_sharing_spark.operators.joins import asof_join
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def test_snapshot_of_empty_log(spark, sf_dir):
    log = generate_envelope_log(spark, sf_dir).filter(F.lit(False))
    assert latest_snapshot(unwrap(log)).count() == 0


def test_apply_empty_batch_is_identity(spark, sf_dir):
    log = generate_envelope_log(spark, sf_dir)
    snap = latest_snapshot(unwrap(log))
    empty = unwrap(log.filter(F.lit(False)))
    merged = apply_changes(snap, empty)
    assert merged.count() == snap.count()


def test_asof_join_empty_right(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase")
    right = events.filter(F.lit(False))
    assert asof_join(left, right, on="user_id", left_ts="ts", right_ts="ts").count() == 0
    # outer variant keeps all left rows, with null match
    outer = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts", inner=False
    )
    assert outer.count() == left.count()
    assert outer.filter(F.col("__asof_ts").isNotNull()).count() == 0


def test_dedup_clusters_no_pairs(spark):
    docs = spark.range(1, 6).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_clusters(docs, pairs)
    assert out.filter("is_survivor").count() == 5
    assert out.filter("cluster_id != doc_id").count() == 0

def test_heavy_hitters_empty_input(spark):
    from aiven_challenge2_cdc_sharing_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    items = spark.createDataFrame([], "item string")
    assert heavy_hitters_exact(items, "item", k=10).count() == 0


def test_dup_ngram_spans_short_docs(spark, tmp_path):
    # docs below the 8-token gram width must yield zero grams, not a
    # backwards Spark sequence() blowup
    docs = [(0, "only three tokens"), (1, "x"), (2, "")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from aiven_challenge2_cdc_sharing_spark.queries.llm_ops import (
        text_dup_ngram_spans,
    )

    out = text_dup_ngram_spans(spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert all(r["n_dup_grams"] == 0 and not r["flagged"] for r in out)


def test_perplexity_single_token_docs(spark, tmp_path):
    # 1-token docs have no bigrams: null entropy, unflagged — and no
    # backwards sequence() on the gram builder
    docs = [(0, "hello"), (1, "hello world hello world")]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from aiven_challenge2_cdc_sharing_spark.queries.llm_ops import (
        text_perplexity_filter,
    )

    out = {r["doc_id"]: r for r in text_perplexity_filter(spark, str(tmp_path)).collect()}
    assert out[0]["n_bigrams"] == 0
    assert out[0]["perplexity"] is None and out[0]["flagged"] is False
    assert out[1]["n_bigrams"] == 3 and out[1]["perplexity"] is not None


def test_semantic_dedup_tiny_inputs(spark):
    # fewer vectors than clusters: the k-means init takes what exists;
    # 1 vector => no pairs; 2 identical vectors => exactly one pair
    from pyspark.sql import Row

    from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
        semantic_dedup_pairs,
    )

    one = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0])])
    assert semantic_dedup_pairs(one, threshold=0.0, n_clusters=4).count() == 0
    two = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 2.0]), Row(vec_id=2, embedding=[1.0, 2.0])]
    )
    got = semantic_dedup_pairs(two, threshold=0.5, n_clusters=4).collect()
    assert [(r.id_a, r.id_b, r.sim) for r in got] == [(1, 2, 1.0)]


def test_containment_and_jaccard_empty_docs(spark):
    from pyspark.sql import Row

    from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
        containment_join,
        jaccard_threshold_join,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert jaccard_threshold_join(empty, "doc_id", "text", 0.5).count() == 0
    assert containment_join(empty, "doc_id", "text", 0.5).count() == 0
    # single doc: no pairs either way
    one = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    assert jaccard_threshold_join(one, "doc_id", "text", 0.5).count() == 0


def test_covariance_of_single_vector_is_zero(spark):
    from pyspark.sql import Row

    from aiven_challenge2_cdc_sharing_spark.operators.pca import (
        covariance_long,
    )

    one = spark.createDataFrame([Row(embedding=[3.0, -1.0, 2.0])])
    cov = covariance_long(one, "embedding", 3).collect()
    assert len(cov) == 9
    assert all(abs(r.c) < 1e-12 for r in cov)
