"""Operator-level tests: skew salting equivalence, pandas-UDF centroids
vs numpy, multimodal decode determinism, LSH recall floor, as-of join
reference semantics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.functions.vector_udfs import label_centroids
from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
)
from aiven_challenge2_cdc_sharing_spark.operators.joins import asof_join
from aiven_challenge2_cdc_sharing_spark.operators.skew import salted_count, salted_join
from aiven_challenge2_cdc_sharing_spark.sources.multimodal import (
    attach_fake_media,
    decode_media_features,
)
from aiven_challenge2_cdc_sharing_spark.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(cust, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "o_custkey", salt_buckets=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_equals_groupby(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    plain = {
        (r["user_id"], r["cnt"])
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["user_id"], r["cnt"]) for r in salted_count(events, "user_id").collect()
    }
    assert plain == salted


def test_label_centroids_match_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["label"]: (r["n"], r["centroid"]) for r in label_centroids(emb).collect()}
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.stack(grp["embedding"].apply(lambda v: np.asarray(v, np.float64)))
        n, centroid = got[int(label)]
        assert n == len(grp)
        assert np.allclose(centroid, mat.mean(axis=0), atol=1e-12)


def test_multimodal_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = decode_media_features(attach_fake_media(docs))
    rows = {r["doc_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in src.items():
        b = text.encode("utf-8")
        r = rows[doc_id]
        assert r["n_bytes"] == len(b)
        assert r["fake_width"] == len(b) % 640
        assert r["byte_sum_mod"] == sum(b) % 1_000_003


def test_minhash_identical_docs_always_pair(spark):
    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words entirely here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    signed = minhash_signature(docs, "text")
    cands = lsh_candidate_pairs(signed, "doc_id")
    verified = jaccard_pairs(cands, docs, "doc_id", "text").collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified}
    assert pairs.get((1, 2)) == 1.0  # identical docs always collide at j=1
    assert (1, 3) not in pairs or pairs[(1, 3)] < 0.2


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    # adversarial corpus: 1000 byte-identical docs -> one degenerate LSH
    # bucket per band.  Uncapped, the self-join would emit ~C(1000,2)
    # (~500k) candidate pairs from pure boilerplate; the cap drops the
    # hot bucket so candidate volume stays bounded.
    rows = [(i, "the same boilerplate footer text appears everywhere") for i in range(1000)]
    rows += [(2000, "alpha beta gamma delta epsilon zeta"),
             (2001, "alpha beta gamma delta epsilon zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    signed = minhash_signature(docs, "text").localCheckpoint(eager=False)
    capped = lsh_candidate_pairs(signed, "doc_id", max_bucket_size=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the giant bucket is gone; the small genuine-dup bucket survives
    assert (2000, 2001) in got
    assert len(got) == 1
    # uncapped control on a small slice still pairs everything
    uncapped = lsh_candidate_pairs(signed, "doc_id", max_bucket_size=None)
    assert uncapped.count() >= 499_500


def test_lsh_bands_must_divide_num_hashes(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    signed = minhash_signature(docs, "text", num_hashes=10)
    with pytest.raises(ValueError, match="not divisible"):
        lsh_candidate_pairs(signed, "doc_id", bands=4, num_hashes=10)


def test_asof_join_matches_reference_semantics(spark):
    trades = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 101.0), (2, 15, 50.0), (3, 5, 7.0)],
        "uid long, t long, px double",
    )
    quotes = spark.createDataFrame(
        [(1, 8, 99.0), (1, 15, 100.5), (1, 20, 100.9), (2, 15, 49.5)],
        "uid long, t long, qx double",
    )
    got = {
        (r["uid"], r["t"]): r["__asof_ts"]
        for r in asof_join(trades, quotes, on="uid", left_ts="t", right_ts="t").collect()
    }
    # uid1 t10 -> quote t8; uid1 t20 -> quote t20 (inclusive); uid2 t15 -> t15
    assert got == {(1, 10): 8, (1, 20): 20, (2, 15): 15}
    # uid3 has no quote: dropped (inner)