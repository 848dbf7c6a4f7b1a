"""Invariant pins for the round-10/11 window-feed batches (built in
round 7, continuation session).

Each family pins a structural truth the cross-engine value hash can't
express on its own: exact algebraic identities (Procrustes disparity
= 1 - congruence^2, price-volume-mix reconciliation residual = 0,
Feld's friendship-paradox ratio >= 1, IPS = 2 * SNIPS * match_rate),
conservation laws (delivered = unique + replays, slice supports sum
to the corpus), null calibrations (membership-inference AUC ~ 0.5 on
a never-trained scorer, md5-uniformity KS accepts), bounds and
monotonicity (k-means inertia falls with k, Qini treated counts grow
along the curve), and non-degeneracy guards (Kadane >= 0 because the
centered series sums to zero; log-rank variance strictly positive).
"""

from __future__ import annotations

import os

import pytest

from aiven_challenge2_cdc_sharing_spark.queries import load_registry

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF001), reason="testdata absent"
)


def _run(spark, name, sf=SF001):
    return load_registry()[name].fn(spark, sf).collect()


def test_logrank_variance_and_flag_consistency(spark):
    (r,) = _run(spark, "surv_logrank_segments")
    assert r.chi2_stat >= 0
    assert r.n_event_times > 0
    assert r.reject_flag == (1 if r.chi2_stat > 3.841 else 0)


def test_skew_planner_order_and_conservation(spark):
    (r,) = _run(spark, "ops_partition_skew_planner")
    assert r.p50_per_key <= r.p99_per_key <= r.max_per_key
    assert 0 < r.top1pct_share <= 1.0
    assert r.suggested_salt >= 1
    # mean * n_keys == total (mean is the exact ratio, 4dp-rounded)
    assert abs(r.mean_per_key * r.n_keys - r.total) <= r.n_keys


def test_kadane_nonnegative_by_centering(spark):
    (r,) = _run(spark, "win_max_subarray_kadane")
    # the centered series sums to zero, so the best contiguous run
    # can never be negative (the full array is always available)
    assert r.best_run_sum >= 0
    assert r.n_days > 100


def test_md5_uniformity_accepts(spark):
    (r,) = _run(spark, "dq_md5_uniformity_ks", SF01)
    assert 0 <= r.d_stat <= 1
    assert r.uniform_flag == 1, "md5 assignment discipline violated!"


def test_wilcoxon_and_ansari_defined(spark):
    (w,) = _run(spark, "stats_wilcoxon_signed_rank")
    assert w.n_pairs > 0 and w.w_plus >= 0
    (a,) = _run(spark, "stats_ansari_bradley")
    assert a.n_building > 0 and a.n_machinery > 0
    assert a.ab_score_sum > 0


def test_delong_ci_brackets_auc(spark):
    (r,) = _run(spark, "ml_auc_delong_variance")
    assert 0 <= r.auc <= 1
    assert r.se_delong > 0
    assert r.ci_lo <= r.auc <= r.ci_hi


def test_wasserstein_bounds(spark):
    (r,) = _run(spark, "ml_drift_wasserstein_1d")
    assert r.w1_distance >= 0
    assert 0 <= r.w1_normalized <= 1


def test_point_in_rect_counts(spark):
    rows = _run(spark, "geo_point_in_rect_join")
    assert len(rows) == 25
    assert all(r.n_inside >= 0 for r in rows)
    assert any(r.n_inside > 0 for r in rows)


def test_err_cascade_monotone(spark):
    (r,) = _run(spark, "search_err_cascade")
    assert 0 <= r.err_at_3 <= r.err_at_10 <= 1.0


def test_procrustes_identity(spark):
    (r,) = _run(spark, "emb_procrustes_2d")
    assert 0 <= r.congruence <= 1.0001
    # disparity = 1 - congruence^2 is an exact algebraic identity of
    # the closed form — both engines must satisfy it independently
    assert abs(r.disparity - (1 - r.congruence**2)) < 1e-3


def test_xmr_limits_order(spark):
    (r,) = _run(spark, "dq_spc_xmr_individuals")
    assert r.lcl_x <= r.xbar <= r.ucl_x
    assert r.ucl_mr > 0


def test_lexical_richness_counts(spark):
    rows = _run(spark, "text_honore_sichel_richness")
    for r in rows:
        assert r.hapax <= r.n_types <= r.n_tokens
        assert 0 <= r.sichel_s <= 1


def test_hill_tail_share(spark):
    (r,) = _run(spark, "stats_hill_tail_index")
    assert r.alpha_hill > 0
    assert 0.05 < r.tail_share < 0.15  # p90 cut => ~10% tail


def test_tukey_pairs_complete(spark):
    rows = _run(spark, "stats_tukey_hsd")
    assert len(rows) == 10  # C(5,2) segment pairs
    assert all(r.q_stat >= 0 for r in rows)


def test_burrows_delta_symmetric_pairs(spark):
    rows = _run(spark, "text_burrows_delta")
    n_sources = (1 + (1 + 8 * len(rows)) ** 0.5) / 2
    assert abs(n_sources - round(n_sources)) < 1e-9  # C(s,2) shape
    assert all(r.delta >= 0 for r in rows)


def test_phash_hamming_bounds(spark):
    rows = _run(spark, "mm_phash_hamming_pairs")
    assert all(0 <= r.hamming <= 3 for r in rows)
    assert all(r.n_pairs > 0 for r in rows)


def test_rayleigh_bounds(spark):
    rows = _run(spark, "stats_rayleigh_hour_uniformity")
    for r in rows:
        assert 0 <= r.resultant_r <= 1
        assert 0 <= r.mean_hour < 24


def test_ips_snips_identity(spark):
    (r,) = _run(spark, "ml_counterfactual_ips_eval")
    # IPS = 2 * SNIPS * match_rate is exact algebra of the estimators
    assert abs(r.ips_value - 2 * r.snips_value * r.match_rate) < 1e-3


def test_slice_supports_conserve(spark):
    rows = _run(spark, "ml_error_slice_audit")
    assert len(rows) == 4
    overall = {r.overall_error for r in rows}
    assert len(overall) == 1  # same denominator everywhere


def test_cindex_bounds(spark):
    (r,) = _run(spark, "stats_concordance_cindex")
    assert 0 <= r.c_index <= 1
    assert r.n_concordant + r.n_tied <= r.n_comparable


def test_qini_monotone_counts(spark):
    rows = _run(spark, "ml_uplift_qini_curve")
    # rows come back ordered by threshold DESC, so cumulative treated
    # counts grow down the rows
    treated = [r.n_treated for r in rows]
    assert treated == sorted(treated)


def test_vif_at_least_one(spark):
    (r,) = _run(spark, "stats_vif_multicollinearity")
    # VIF_i = (R^-1)_ii >= 1 for any correlation matrix
    assert r.vif_quantity >= 1 - 1e-6
    assert r.vif_price >= 1 - 1e-6
    assert r.vif_discount >= 1 - 1e-6


def test_weibull_positive_params(spark):
    (r,) = _run(spark, "stats_weibull_gap_fit")
    assert r.shape_k > 0
    assert r.scale_days > 0


def test_query_likelihood_log_scores(spark):
    rows = _run(spark, "search_query_likelihood_lm")
    assert len(rows) == 10
    assert all(r.score < 0 for r in rows)  # log-probabilities
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_tail_dependence_bounds(spark):
    (r,) = _run(spark, "stats_tail_dependence_lambda")
    assert 0 <= r.lambda_upper <= 1
    assert 0 <= r.lambda_lower <= 1


def test_burt_constraint_positive(spark):
    rows = _run(spark, "graph_burt_constraint")
    assert len(rows) == 25
    for r in rows:
        assert r.burt_constraint > 0
        assert 0 < r.max_share <= 1


def test_partition_prune_months(spark):
    rows = _run(spark, "src_partitioned_write_prune")
    assert 1 <= len(rows) <= 12
    assert all(r.n_orders > 0 for r in rows)


def test_randomized_response_debias(spark):
    (r,) = _run(spark, "privacy_randomized_response_debias", SF01)
    # debiased estimator within 5 SEs of the hidden truth
    assert abs(r.debiased_rate - r.true_rate) <= 5 * r.se_debiased


def test_hypergeom_folds(spark):
    rows = _run(spark, "stats_hypergeom_nation_enrichment")
    assert len(rows) == 25
    for r in rows:
        assert r.fold_enrichment >= 0
        assert r.expected_open > 0


def test_elbow_inertia_falls_with_k(spark):
    rows = {r.k: r for r in _run(spark, "ml_kmeans_elbow_inertia")}
    assert set(rows) == {4, 8, 16}
    assert rows[4].inertia >= rows[16].inertia
    assert all(r.n_nonempty <= k for k, r in rows.items())


def test_exactly_once_conservation(spark):
    (r,) = _run(spark, "cdc_dedup_exactly_once_effect")
    assert r.n_delivered == r.n_unique_ops + r.n_replays
    assert r.version_rows_naive_append >= r.snapshot_rows_idempotent


def test_catalog_key_flags(spark):
    rows = {r.table_name: r for r in _run(spark, "dq_catalog_profile")}
    assert len(rows) == 10
    assert rows["lineitem"].key_unique_flag == 0  # expected fan-out
    assert rows["orders"].key_unique_flag == 1
    assert rows["customer"].key_unique_flag == 1


def test_slo_burn_bounds(spark):
    (r,) = _run(spark, "ops_slo_burn_rate_alert")
    assert r.n_hours >= 24 * 25
    assert r.max_burn_1h >= 0
    assert r.n_fast_alerts <= r.n_slow_breaches + r.n_fast_alerts


def test_cutover_identity(spark):
    (r,) = _run(spark, "cdc_backfill_cutover_check")
    assert r.n_diff == 0, "backfill + tail must equal full replay"
    assert r.cutover_ok == 1
    assert r.n_resumed == r.n_full


def test_negbin_defined_when_overdispersed(spark):
    rows = _run(spark, "stats_negbin_fit_daily")
    for r in rows:
        if r.poisson_adequate_flag == 0:
            assert r.nb_r is not None and r.nb_r > 0
            assert r.nb_p is not None and 0 < r.nb_p <= 1
        else:
            assert r.nb_r is None


def test_its_r2_bounds(spark):
    (r,) = _run(spark, "ts_interrupted_series_effect")
    assert 0 <= r.r2_pre <= 1
    assert 0 <= r.r2_post <= 1


def test_markov_stationary_sums_to_one(spark):
    rows = _run(spark, "dash_markov_stationary_mix")
    assert abs(sum(r.stationary_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.empirical_share for r in rows) - 1.0) < 1e-3


def test_schema_merge_conservation(spark):
    (r,) = _run(spark, "src_schema_merge_evolution")
    assert r.n_with_priority + r.n_null_priority == r.n_rows_merged
    assert 0 < r.null_share_evolved_col < 1


def test_propensity_unconfounded_fixture(spark):
    (r,) = _run(spark, "ml_propensity_strat_att", SF01)
    # arm is md5-randomized => stratification and naive agree up to
    # finite-sample imbalance
    assert abs(r.confounding_bias) < 0.1
    assert r.n_strata >= 2


def test_rank_churn_bounds(spark):
    (r,) = _run(spark, "dash_topk_rank_churn")
    assert 0 <= r.n_common <= 20
    assert r.n_new_entrants == 20 - r.n_common


def test_friendship_paradox_feld(spark):
    (r,) = _run(spark, "graph_friendship_paradox")
    # Feld's theorem: mean neighbor degree >= mean degree, always
    assert r.paradox_ratio >= 1 - 1e-9


def test_mix_decomp_reconciles(spark):
    (r,) = _run(spark, "dash_price_volume_mix_decomp")
    assert r.reconciliation_residual == 0.0


def test_bbse_prior_in_range(spark):
    (r,) = _run(spark, "ml_label_shift_bbse")
    assert 0 <= r.target_pos_prior_est <= 1
    assert r.n_source > 0 and r.n_target > 0


def test_membership_null_calibration(spark):
    (r,) = _run(spark, "privacy_membership_inference_auc", SF01)
    # scorer never saw the member split => AUC inside the exact
    # Mann-Whitney null band (scale-adaptive, not a fixed 5%)
    assert abs(r.attack_auc - 0.5) <= r.null_crit_995
    assert r.leakage_acceptable_flag == 1


def test_snm_distances_nonzero(spark):
    rows = _run(spark, "er_sorted_neighborhood_pairs")
    assert all(1 <= r.edit_distance <= 2 for r in rows)


def test_capture_recapture_consistency(spark):
    (r,) = _run(spark, "stats_capture_recapture_users")
    assert r.n_recaptured <= min(r.n_capture1, r.n_capture2)
    assert r.chapman_estimate >= r.n_recaptured


def test_spell_correct_ranking(spark):
    rows = _run(spark, "search_spell_correct_topk")
    assert 1 <= len(rows) <= 5
    assert all(r.edit_distance <= 2 for r in rows)
    key = [(r.edit_distance, -r.freq, r.suggestion) for r in rows]
    assert key == sorted(key)


def test_interval_union_bounded_by_month(spark):
    rows = _run(spark, "win_interval_union_coverage")
    # 30-day window => at most 30*48 half-hours of coverage
    assert all(0 <= r.coverage_half_hours <= 30 * 48 for r in rows)
    assert sum(r.n_users for r in rows) > 0


def test_forecast_combo_weights_sum(spark):
    (r,) = _run(spark, "ts_forecast_combination_eval")
    assert abs(r.w_naive + r.w_mean + r.w_drift - 1.0) < 1e-3
    assert r.mae_combo >= 0


def test_hilbert_formulation_matches_canonical():
    """Exhaustive check of the mod-s Hilbert reformulation against
    the canonical xy2d algorithm over every cell of the 64x64 grid
    (pure Python, no Spark) — the guarantee the SQL unrolling rests
    on — plus the unit-step locality property."""
    from aiven_challenge2_cdc_sharing_spark.queries.coverage_round10 import (
        _HILBERT_LEVELS,
    )

    def canon(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    def mine(x, y):
        d = 0
        for s in _HILBERT_LEVELS:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - (y % s), s - 1 - (x % s)
                else:
                    x, y = y % s, x % s
            else:
                x, y = x % s, y % s
        return d

    pts = {}
    for x in range(64):
        for y in range(64):
            assert canon(64, x, y) == mine(x, y), (x, y)
            pts[mine(x, y)] = (x, y)
    assert len(pts) == 4096  # bijection
    ordered = [pts[d] for d in sorted(pts)]
    for (x0, y0), (x1, y1) in zip(ordered, ordered[1:]):
        assert abs(x1 - x0) + abs(y1 - y0) == 1  # unit steps


def test_hilbert_layout_query_locality(spark):
    (r,) = _run(spark, "layout_hilbert_vs_zorder_locality")
    assert r.locality_advantage > 1.0  # Hilbert strictly wins
    assert r.hilbert_max_jump < r.zorder_max_jump
    assert r.n_steps == r.n_occupied_cells - 1


def test_cart_depth2_structure(spark):
    rows = _run(spark, "ml_cart_depth2_gini")
    assert [r.node for r in rows] == ["root", "left", "right"]
    for r in rows:
        assert r.feature in (1, 2)
        assert 0 <= r.threshold_bin <= 14
        assert 0 <= r.split_gini <= 0.5 + 1e-9  # binary Gini bound
    # children can only purify: each child split's weighted Gini is
    # bounded by the parent's 0.5 worst case, and n_left < node size
    assert rows[0].n_left > 0


def test_bass_fit_flags_consistent(spark):
    (r,) = _run(spark, "dash_bass_diffusion_fit")
    if r.bass_shape_valid_flag == 1:
        assert r.peak_day_estimate is not None
        assert r.p_innovation > 0 and r.q_imitation > 0
    else:
        assert r.peak_day_estimate is None


def test_cointegration_outputs(spark):
    (r,) = _run(spark, "ts_cointegration_eg_test")
    assert r.n_diffs > 10
    assert r.cointegrated_flag == (1 if r.adf_t_stat < -3.34 else 0)


def test_obf_boundary_monotone(spark):
    rows = _run(spark, "ab_group_sequential_obf")
    assert [r.interim for r in rows] == [1, 2, 3, 4]
    bounds = [r.obf_boundary for r in rows]
    # OBF spends alpha late: boundaries strictly fall toward the end
    assert bounds == sorted(bounds, reverse=True)
    ns = [r.n_treatment + r.n_control for r in rows]
    assert ns == sorted(ns)  # enrollment only grows


def test_abc_xyz_shares_sum(spark):
    rows = _run(spark, "dash_abc_xyz_matrix")
    assert 1 <= len(rows) <= 9
    assert abs(sum(r.revenue_share for r in rows) - 1.0) < 1e-3
    assert {r.abc_class for r in rows} <= {"A", "B", "C"}
    assert {r.xyz_class for r in rows} <= {"X", "Y", "Z"}


def test_did_identity(spark):
    (r,) = _run(spark, "stats_diff_in_diff_revenue")
    assert (
        abs(
            r.did_estimate
            - (r.treated_delta - r.control_delta)
        )
        < 0.02
    )
    assert r.pre_trend_gap >= 0


def test_pu_prior_bounds(spark):
    (r,) = _run(spark, "ml_pu_prior_elkan_noto")
    assert 0 < r.c_label_propensity <= 1
    assert r.n_labeled < r.n
    assert 0 <= r.true_prior <= 1


def test_storey_qvalues_dominated_by_p(spark):
    rows = _run(spark, "stats_fdr_storey_qvalues")
    assert len(rows) == 25
    for r in rows:
        assert 0 <= r.p_value <= 1
        assert r.q_value >= 0
    pi0 = {r.pi0_estimate for r in rows}
    assert len(pi0) == 1
    assert 0.05 <= pi0.pop() <= 1.0


def test_ohlc_bounds(spark):
    (r,) = _run(spark, "ts_ohlc_daily")
    assert r.month_low <= r.month_high
    assert r.avg_body <= r.avg_range + 1e-9  # body is inside range
    assert 0 <= r.n_up_days <= r.n_days


def test_csv_recovery_exact_counts(spark):
    (r,) = _run(spark, "src_csv_corrupt_recovery")
    assert r.n_corrupt_rows == 3
    assert r.n_good_rows == 25
    assert r.n_total_lines == 28


def test_cascade_monotone(spark):
    rows = _run(spark, "graph_threshold_cascade")
    counts = [r.n_active for r in rows]
    assert counts[0] == 2  # two seeds
    assert counts == sorted(counts)  # activation never shrinks
    assert counts[-1] <= 25


def test_mrmr_two_distinct_features(spark):
    rows = _run(spark, "ml_mrmr_feature_select")
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].feature != rows[1].feature
    assert rows[0].redundancy_mi == 0.0
    assert rows[1].relevance_mi <= rows[0].relevance_mi + 1e-9


def test_fleiss_kappa_bounds(spark):
    (r,) = _run(spark, "stats_fleiss_kappa_raters")
    assert -1 <= r.fleiss_kappa <= 1
    assert 0 <= r.observed_agreement <= 1
    assert 0.5 <= r.expected_agreement <= 1  # 2-category floor


def test_welford_merge_exact(spark):
    (r,) = _run(spark, "agg_welford_merge_check")
    assert r.merge_exact_flag == 1
    assert r.mean_merged == r.mean_direct
    assert r.sd_merged == r.sd_direct


def test_dbscan_cluster_consistency(spark):
    (r,) = _run(spark, "geo_grid_dbscan_clusters")
    assert r.n_core_cells <= r.n_occupied_cells
    assert r.n_clusters <= max(r.n_core_cells, 1)
    if r.n_clusters > 0:
        assert r.largest_cluster_cells >= 1


def test_cohort_halflife_signs(spark):
    rows = _run(spark, "cohort_decay_halflife", SF01)
    assert rows
    for r in rows:
        if r.half_life_weeks is not None:
            assert r.half_life_weeks > 0
            assert r.log_decay_slope < 0


def test_eb_shrinkage_direction(spark):
    rows = _run(spark, "stats_eb_beta_shrinkage")
    assert len(rows) == 25
    mu = sum(r.raw_rate * r.n for r in rows) / sum(r.n for r in rows)
    for r in rows:
        assert r.prior_alpha > 0 and r.prior_beta > 0
        # shrinkage always moves toward the prior mean, never past it
        if r.raw_rate > r.shrunk_rate:
            assert r.shrunk_rate >= min(mu, r.raw_rate) - 0.05
        assert 0 <= r.shrunk_rate <= 1


def test_delta_method_ci_brackets(spark):
    (r,) = _run(spark, "stats_ratio_delta_method_se")
    assert r.ci_lo <= r.ratio_value_per_event <= r.ci_hi
    assert r.se_delta > 0


def test_average_precision_bounds(spark):
    (r,) = _run(spark, "ml_average_precision_ap")
    # AP >= prevalence is NOT a theorem (an anti-predictive scorer
    # sits below random); the invariants are the hard bounds and the
    # lift identity
    assert 0.0 <= r.average_precision <= 1.0
    assert 0.0 < r.prevalence_baseline < 1.0
    assert (
        abs(
            r.lift_over_random
            - round(r.average_precision / r.prevalence_baseline, 4)
        )
        < 1e-3
    )


def test_share_export_verifies(spark):
    (r,) = _run(spark, "cdc_snapshot_share_export")
    assert r.manifest_verified == 1
    assert r.roundtrip_verified == 1
    assert r.n_rows > 0


def test_knee_point_concavity(spark):
    (r,) = _run(spark, "agg_knee_point_kneedle")
    assert 0.1 <= r.knee_share_of_parts <= 1.0
    assert r.knee_share_of_revenue >= r.knee_share_of_parts - 1e-9
    assert r.max_chord_distance >= 0


def test_c2st_bounds(spark):
    (r,) = _run(spark, "ml_c2st_stump_drift")
    # the best-of-both-orientations stump can never be below chance
    assert r.c2st_accuracy >= 0.5 - 1e-9
    assert 0 <= r.split_bin <= 31
