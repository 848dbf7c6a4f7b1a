"""Invariant pins for the round-9 authoring batch
(queries/coverage_round12.py) — semantic properties the oracle hash
can't see, same model as tests/test_round10_ops.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.tables import load_table

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_registry()


def _rows(spark, registry, name, sf=SF001):
    return registry[name].fn(spark, sf).collect()


def test_geohash_rollup_partitions_all_customers(spark, registry):
    rows = _rows(spark, registry, "geo_geohash_rollup")
    n_cust = load_table(spark, SF001, "customer").count()
    assert sum(r.n_customers for r in rows) == n_cust
    # prefix property: parent cell is the fine cell's high bits, so
    # every parent holds between 1 and 256 fine cells
    assert all(1 <= r.n_fine_cells <= 256 for r in rows)
    assert all(0 <= r.cell8 < 256 for r in rows)


def test_quantile_bins_are_equal_frequency(spark, registry):
    rows = _rows(spark, registry, "prep_quantile_binning")
    assert [r.bin for r in rows] == list(range(10))
    counts = [r.n_orders for r in rows]
    assert max(counts) - min(counts) <= 1  # exact equal-frequency
    # bins tile the value range in order
    for lo_next, hi_prev in zip(rows[1:], rows[:-1]):
        assert lo_next.lo >= hi_prev.hi - 1e-9


def test_loo_encoding_removes_self_leakage(spark, registry):
    rows = _rows(spark, registry, "ml_loo_target_encode")
    for r in rows:
        # LOO anti-correlates with the label (naive encoding would be
        # +p(1-p)); equality to 0 only in degenerate all-same-label cats
        assert r.cov_loo_y <= 0
        # per-row encodings bracket the category mean
        assert r.enc_pos_rows <= r.mean_y <= r.enc_neg_rows


def test_absence_counts_partition_views(spark, registry):
    rows = _rows(spark, registry, "cep_absence_timeout")
    ev = load_table(spark, SF001, "events")
    n_views = ev.filter(F.col("event_type") == "view").count()
    assert sum(r.n_views for r in rows) == n_views
    for r in rows:
        assert r.n_converted_1h + r.n_absent == r.n_views
        assert 0.0 <= r.absence_rate <= 1.0


def test_dp_exponential_releases_exactly_3(spark, registry):
    rows = _rows(spark, registry, "privacy_dp_exponential_topk")
    assert len(rows) == 3
    # noisy scores are the released ordering
    scores = [r.noisy_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bitmap_distinct_always_matches_exact(spark, registry):
    rows = _rows(spark, registry, "agg_bitmap_distinct_rollup")
    assert rows and all(r.bitmap_exact_match for r in rows)


def test_dice_bands_are_set_cardinality_ratios(spark, registry):
    rows = _rows(spark, registry, "er_token_blocking_dice")
    # 2-3 distinct tokens per entity -> Dice in {2k/(na+nb)} lands on
    # a small rational grid; every band must be in (0, 1]
    assert rows and all(0.0 < r.dice_band <= 1.0 for r in rows)
    assert all(r.n_weighted_row_pairs >= r.n_entity_pairs for r in rows)


def test_bitwise_suite_identities(spark, registry):
    rows = _rows(spark, registry, "fn_bitwise_suite")
    for r in rows[:50]:
        k = r.c_custkey
        assert r.k_shl == k * 4
        assert r.k_shr == k // 8
        assert r.k_and == k % 256
        assert r.k_bit5 == (k >> 5) & 1
        assert r.k_xor == k ^ 255


@pytest.mark.parametrize(
    "name,hof_path",
    [
        (
            "emb_hubness_indegree",
            "aiven_challenge2_cdc_sharing_spark.queries."
            "coverage_round8:_hubness_hof",
        ),
        (
            "emb_two_nn_intrinsic_dim",
            "aiven_challenge2_cdc_sharing_spark.queries."
            "coverage_round9:_two_nn_hof",
        ),
        (
            "emb_triplet_margin_stats",
            "aiven_challenge2_cdc_sharing_spark.queries."
            "coverage_round9:_triplet_hof",
        ),
        (
            "ml_knn_classify",
            "aiven_challenge2_cdc_sharing_spark.queries."
            "coverage_round5:_ml_knn_classify_hof",
        ),
    ],
)
def test_blas_promotion_parity(spark, registry, name, hof_path):
    """Round-9 promotions: each registry default is the BLAS cogroup
    scorer; its HOF sequential-fold twin must agree EXACTLY (measured
    bit-identical at every scale incl. the N=20k stress point before
    the swap — this pin is the per-round tripwire for a BLAS library
    change flipping a 6dp-rounded sim)."""
    import importlib

    mod_name, fn_name = hof_path.split(":")
    hof = getattr(importlib.import_module(mod_name), fn_name)
    a = sorted(tuple(r) for r in registry[name].fn(spark, SF001).collect())
    b = sorted(tuple(r) for r in hof(spark, SF001).collect())
    assert a == b


def test_blas_bucket_candidates_tie_break_synthetic(spark):
    """The operator is the registry default for 5 queries; the
    real-data parity pins rarely exercise EXACT sim ties, so force
    them: duplicate build vectors (identical rounded sims) must break
    ties by nb ascending, identically to the HOF window's
    orderBy(desc(sim), nb), and per-bucket top-k over disjoint
    buckets must equal the global top-k."""
    from pyspark.sql import Window
    from aiven_challenge2_cdc_sharing_spark.operators.similarity import (
        _dot,
        blas_bucket_candidates,
    )

    # 3 probe vectors; 12 build vectors in 2 disjoint buckets, with
    # each build vector DUPLICATED under a different nb so every sim
    # appears at least twice (forced tie at full float precision)
    base = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
            [0.6, 0.8, 0.0, 0.0], [0.0, 0.6, 0.8, 0.0],
            [0.28, 0.96, 0.0, 0.0], [0.0, 0.0, 0.6, 0.8]]
    build_rows = []
    for rep in range(2):
        for i, v in enumerate(base):
            nb = rep * 100 + i
            build_rows.append((nb, nb % 3, v, (i % 2)))
    probes_rows = [
        (1000 + j, j % 3, v, b)
        for j, v in enumerate(base[:3])
        for b in (0, 1)
    ]
    build = spark.createDataFrame(
        build_rows, "nb long, nlabel int, ven array<double>, bucket long"
    )
    probes = spark.createDataFrame(
        probes_rows, "vec_id long, label int, en array<double>, bucket long"
    )
    got = blas_bucket_candidates(probes, build, k=5)
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), "nb")
    top5 = (
        got.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
    # HOF reference: full cross join, same rounding, same tie-break
    ref = (
        probes.filter(F.col("bucket") == 0).drop("bucket")
        .crossJoin(F.broadcast(build.drop("bucket")))
        .filter(F.col("nb") != F.col("vec_id"))
        .select(
            "vec_id", "label", "nb", "nlabel",
            F.round(_dot(F.col("en"), F.col("ven")), 6).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .drop("rn")
    )
    a = sorted(tuple(r) for r in top5.collect())
    b = sorted(tuple(r) for r in ref.collect())
    assert a == b
    # the forced ties are real: each probe's top-5 must contain at
    # least one duplicated-sim pair — this guards the FIXTURE (without
    # it the a == b equality above would pass vacuously on tie-free
    # data).  The tie-break itself is validated by that equality: had
    # the operator's per-bucket lexsort kept the wrong nb of a tied
    # pair, the kept set would differ from the reference's
    # (sim desc, nb asc) top-5.  (A previous within-group nb-ascends
    # loop was dropped — it re-derived the test's own sort order, not
    # operator behavior; round-9 advice item.)
    by_probe = {}
    for r in a:
        by_probe.setdefault(r[0], []).append(r[4])
    for probe_id, sims in by_probe.items():
        assert len(sims) != len(set(sims)), (
            f"probe {probe_id}: no tie exercised — test data broken"
        )
