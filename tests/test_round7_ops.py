"""Invariant pins for the round-7 part-2 query batch.

Each new family gets a structural invariant the oracle hash can't
express on its own: curve monotonicity (Lorenz), cross-operator
consistency (sessionizer twins agree on session counts), conservation
laws (shares sum to 1, confusion cells partition the corpus), and
ordering laws (nested train splits give monotone n_train, quartiles
are ordered).
"""

from __future__ import annotations

import math
import os

import pytest

from aiven_challenge2_cdc_sharing_spark.queries import load_registry

SF01 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.01 testdata absent"
)


def _run(spark, name):
    return load_registry()[name].fn(spark, SF01).collect()


def test_heaps_fit_well_defined(spark):
    (row,) = _run(spark, "text_heaps_law_fit")
    assert row.n_points == 20
    # growing bigram vocabulary: a positive sub-linear exponent and a
    # finite r2 — the degenerate 0/0 regime the unigram formulation
    # hit is structurally excluded
    assert 0.0 < row.heaps_beta < 1.0
    assert row.heaps_k > 0
    assert not math.isnan(row.r2) and 0.0 <= row.r2 <= 1.0


def test_session_twins_agree_on_session_count(spark):
    hist = _run(spark, "dash_session_duration_hist")
    bounce = _run(spark, "dash_bounce_rate")
    sessions = load_registry()["win_session_windows"].fn(spark, SF01)
    n_sessions = sessions.count()
    assert sum(r.n_sessions for r in hist) == n_sessions
    assert sum(r.n_sessions for r in bounce) == n_sessions
    assert all(0.0 <= r.bounce_rate <= 1.0 for r in bounce)
    assert sum(r.n_bounces for r in bounce) <= n_sessions


def test_langid_confusion_partitions_corpus(spark):
    (row,) = _run(spark, "text_langid_confusion")
    docs = load_registry()["text_doc_stats"].fn(spark, SF01).count()
    assert row.tp + row.fp + row.fn + row.tn == docs
    for m in (row.precision_en, row.recall_en, row.f1_en):
        assert m is None or 0.0 <= m <= 1.0


def test_abc_shares_conserve(spark):
    rows = _run(spark, "agg_abc_classification")
    assert [r.abc_class for r in rows] == ["A", "B", "C"]
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-4
    # A holds at most 80% plus one part's worth of slack by the
    # prefix definition; it must be nonempty and the plurality of
    # revenue on a TPC-H-ish distribution
    assert rows[0].n_parts > 0
    assert rows[0].revenue_share >= rows[2].revenue_share


def test_lorenz_curve_shape(spark):
    rows = _run(spark, "agg_lorenz_curve_points")
    assert len(rows) == 10
    shares = [r.cum_revenue_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert abs(shares[-1] - 1.0) < 1e-6
    # ascending-revenue ordering puts the curve on/below the diagonal
    assert all(
        r.cum_revenue_share <= r.cum_pop_share + 1e-6 for r in rows
    )


def test_simpson_counts_partition(spark):
    (row,) = _run(spark, "stats_simpsons_paradox")
    assert row.n_agree + row.n_reverse == row.n_subgroups
    assert row.simpson_flag == (row.n_reverse > row.n_agree)


def test_funnel_latency_ordered(spark):
    (row,) = _run(spark, "funnel_signup_purchase_latency")
    assert 0 <= row.n_converted <= row.n_signup_users
    if row.n_converted:
        assert row.p25_secs <= row.median_secs <= row.p75_secs
        assert row.p25_secs >= 0


def test_learning_curve_monotone_train(spark):
    rows = _run(spark, "ml_learning_curve")
    assert [r.train_pct for r in rows] == [10, 20, 40, 80]
    ns = [r.n_train for r in rows]
    assert all(b >= a for a, b in zip(ns, ns[1:]))
    assert all(0.0 <= r.accuracy <= 1.0 for r in rows)
    # the held-out split is shared: one n_test across fractions
    assert len({r.n_test for r in rows}) == 1


def test_class_weights_inverse_freq_normalized(spark):
    rows = _run(spark, "ml_class_weights")
    total = sum(r.n for r in rows)
    # sum_c n_c * (t / (k * n_c)) = t  =>  weighted mean weight = 1
    weighted = sum(r.n * r.inv_freq_weight for r in rows) / total
    assert abs(weighted - 1.0) < 1e-4
    assert all(r.eff_num_weight > 0 for r in rows)


def test_centroid_hist_conserves_vectors(spark):
    rows = _run(spark, "emb_cosine_to_centroid_hist")
    assert all(-10 <= r.band <= 9 for r in rows)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-2


def test_generalization_ladder_coarsens(spark):
    rows = {r.level: r for r in _run(spark, "privacy_generalization_bands")}
    l0, l1, l2 = (
        rows["L0_nation_bal100_seg"],
        rows["L1_region_bal1000_seg"],
        rows["L2_region_seg"],
    )
    # each rung strictly coarsens: fewer classes, never-smaller
    # minimum class size
    assert l0.n_classes >= l1.n_classes >= l2.n_classes
    assert l0.min_class_size <= l1.min_class_size <= l2.min_class_size
    assert l0.small_rows_share >= l2.small_rows_share


def test_freshness_lags_nonnegative(spark):
    rows = _run(spark, "dq_freshness_lag")
    assert len(rows) == 5
    assert all(r.lag_secs >= 0 for r in rows)
    # the freshest stream defines the watermark: lag 0 somewhere
    assert min(r.lag_secs for r in rows) == 0


# ---------------------------------------------------------- batch 3


def test_skyline_mutual_nondominance_and_coverage(spark):
    sky = _run(spark, "agg_skyline_pareto_2d")
    # pairwise non-dominance inside the frontier
    for a in sky:
        for b in sky:
            if a.p_partkey == b.p_partkey:
                continue
            dominated = (
                a.price <= b.price
                and a.size >= b.size
                and (a.price < b.price or a.size > b.size)
            )
            assert not dominated, (a, b)
    # completeness: every part is dominated by some skyline point or
    # IS a skyline point
    from aiven_challenge2_cdc_sharing_spark.tables import load_table

    parts = load_table(spark, SF01, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    sky_keys = {r.p_partkey for r in sky}
    for p in parts:
        if p.p_partkey in sky_keys:
            continue
        assert any(
            s.price <= p.p_retailprice
            and s.size >= p.p_size
            and (s.price < p.p_retailprice or s.size > p.p_size)
            for s in sky
        ), p


def test_global_prefix_max_matches_window(spark):
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aiven_challenge2_cdc_sharing_spark.operators.topk import (
        global_prefix_max,
    )

    rng = random.Random(13)
    rows = [(i, rng.randint(0, 1000)) for i in range(5000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k: long, v: long")
    got = {
        r.k: r.pm
        for r in global_prefix_max(
            df, [F.col("k")], "v", out_col="pm", partitions=16
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.k: r.pm
        for r in df.withColumn("pm", F.max("v").over(w)).collect()
    }
    assert got == want


def test_woe_iv_nonnegative(spark):
    rows = _run(spark, "ml_woe_binning")
    assert len(rows) == 5
    # each IV contribution (p-q)*ln(p/q) is nonnegative by convexity
    assert all(r.iv_contrib >= -1e-9 for r in rows)


def test_theil_decomposition_adds_up(spark):
    (row,) = _run(spark, "agg_theil_index_decomposition")
    assert row.theil_within >= -1e-9 and row.theil_between >= -1e-9
    assert abs(
        row.theil_total - (row.theil_within + row.theil_between)
    ) < 1e-4


def test_jsd_bounded(spark):
    import math

    rows = _run(spark, "text_js_divergence_sources")
    assert all(-1e-9 <= r.jsd <= math.log(2) + 1e-9 for r in rows)


def test_cramers_v_bounded(spark):
    rows = _run(spark, "stats_cramers_v_pairs")
    assert len(rows) == 3
    assert all(0.0 <= r.cramers_v <= 1.0 for r in rows)
    assert all(r.chi2 >= 0.0 for r in rows)


def test_changepoint_splits_series(spark):
    (row,) = _run(spark, "ts_changepoint_binary_seg")
    days = _run(spark, "dq_spc_c_chart")  # same calendar domain
    assert row.n_before + row.n_after == len(days)
    assert row.t_stat >= 0
    assert row.n_before >= 1 and row.n_after >= 1


def test_c_chart_limits(spark):
    rows = _run(spark, "dq_spc_c_chart")
    assert all(r.lcl >= 0 for r in rows)
    assert all(r.ucl > r.cbar for r in rows)
    assert all(r.above_ucl == (r.c > r.ucl) for r in rows)


def test_interorder_gaps_conserve(spark):
    from aiven_challenge2_cdc_sharing_spark.tables import load_table

    (row,) = _run(spark, "win_interorder_gap_stats")
    orders = load_table(spark, SF01, "orders")
    n_orders = orders.count()
    n_cust = orders.select("o_custkey").distinct().count()
    # k orders per customer contribute k-1 gaps
    assert row.n_gaps == n_orders - n_cust
    assert row.p25_days <= row.median_days <= row.p75_days
    assert row.median_days <= row.max_gap_days


def test_norm_profile_ordered(spark):
    rows = _run(spark, "emb_norm_profile")
    for r in rows:
        assert r.min_norm <= r.mean_norm <= r.max_norm
        assert r.std_norm >= 0


# ---------------------------------------------------------- batch 4


def test_ks_per_dim_bounded(spark):
    rows = _run(spark, "ml_feature_drift_ks_per_dim")
    assert len(rows) == 10
    assert all(0.0 <= r.ks_stat <= 1.0 for r in rows)
    ks = [r.ks_stat for r in rows]
    assert all(a >= b for a, b in zip(ks, ks[1:]))


def test_type_coverage_monotone(spark):
    rows = _run(spark, "text_type_coverage_budget")
    assert [r.threshold_pct for r in rows] == [50, 80, 90, 95]
    nt = [r.n_types for r in rows]
    assert all(b >= a for a, b in zip(nt, nt[1:]))
    for r in rows:
        assert r.coverage_share >= r.threshold_pct / 100.0 - 1e-9


def test_welch_t_consistent_with_means(spark):
    (row,) = _run(spark, "stats_welch_t_test")
    assert (row.t_stat > 0) == (row.mean_a > row.mean_b)
    assert row.df_welch > 1
    assert row.df_welch <= row.n_a + row.n_b - 2 + 1e-6


def test_days_to_nth_monotone(spark):
    rows = _run(spark, "dash_days_to_nth_order")
    assert [r.nth for r in rows] == [2, 3, 5]
    med = [r.median_days for r in rows]
    # reaching a later milestone can't take less time at the median
    assert all(b >= a for a, b in zip(med, med[1:]))
    nc = [r.n_customers for r in rows]
    assert all(b <= a for a, b in zip(nc, nc[1:]))
    for r in rows:
        assert r.p25_days <= r.median_days <= r.p75_days


def test_ochiai_bounded_and_normalizing(spark):
    rows = _run(spark, "graph_bipartite_ochiai_weights")
    assert all(0.0 < r.ochiai <= 1.0 for r in rows)
    assert all(r.n_ab >= 3 for r in rows)


# ---------------------------------------------------------- batch 5


def test_dow_strength_bounded(spark):
    (row,) = _run(spark, "ts_dow_seasonality_strength")
    assert 0.0 <= row.eta_squared <= 1.0
    assert 0 <= row.peak_dow <= 6


def test_negative_sampling_distribution(spark):
    rows = _run(spark, "ml_negative_sampling_table")
    # probabilities positive and ordered with count rank; cumulative
    # mass monotone and <= 1
    assert all(r.p_neg > 0 for r in rows)
    cp = [r.cum_p for r in rows]
    assert all(b >= a for a, b in zip(cp, cp[1:]))
    assert cp[-1] <= 1.0 + 1e-6
    # 3/4-power flattening: top token's share of the sampling table
    # is below its raw frequency share
    tot_n = sum(r.n for r in rows)
    assert rows[0].p_neg < rows[0].n / tot_n


def test_separability_consistent(spark):
    rows = _run(spark, "emb_inter_intra_separability")
    assert len(rows) == 10
    for r in rows:
        assert r.intra_dist > 0 and r.inter_dist > 0
        assert r.nearest_label != r.label
        assert abs(r.separability - r.inter_dist / r.intra_dist) < 1e-3


def test_cdc_stats_match_log(spark):
    from aiven_challenge2_cdc_sharing_spark.cdc import (
        generate_envelope_log,
    )

    rows = {r.op: r for r in _run(spark, "cdc_change_data_stats")}
    log_n = generate_envelope_log(spark, SF01).count()
    assert sum(r.n_events for r in rows.values()) == log_n
    assert abs(sum(r.share_of_log for r in rows.values()) - 1.0) < 1e-4
    # replays only exist on inserts (generator replays the c-ops)
    assert rows["c"].n_replays > 0
    assert rows["u"].n_replays == 0 and rows["d"].n_replays == 0


def test_time_to_next_purchase_labels(spark):
    rows = {r.event_type: r for r in _run(spark, "win_time_to_next_purchase")}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    for r in rows.values():
        assert 0 <= r.n_labeled <= r.n_events
        if r.n_labeled:
            assert r.median_secs >= 0
            assert r.p90_secs >= r.median_secs


def test_log_bins_partition_and_ranges(spark):
    rows = _run(spark, "agg_histogram_log_bins")
    from aiven_challenge2_cdc_sharing_spark.tables import load_table

    n_orders = load_table(spark, SF01, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    for r in rows:
        # bin b holds cents in [2^(b-1), 2^b)
        assert 2 ** (r.bin - 1) <= r.min_cents <= r.max_cents < 2 ** r.bin
