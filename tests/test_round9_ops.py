"""Invariant pins for the round-9 query batches (built in round 7).

Each family gets a structural invariant the oracle hash can't express
on its own: non-degeneracy guards (drawdown strictly positive on the
centered path — the lesson-17 class of silent degeneracy both engines
would agree on), conservation (sign-test pos+neg == pairs, HL pair
mass == |R| x |N|), bounds (|ccf| <= 1, CI brackets the point
estimate), and ordering contracts (top-k scores non-increasing).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.tables import load_table

SF01 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.01 testdata absent"
)


def _run(spark, name):
    return load_registry()[name].fn(spark, SF01).collect()


def test_drawdown_non_degenerate_and_bounded(spark):
    rows = _run(spark, "ts_max_drawdown_runup")
    assert rows
    for r in rows:
        # the centered path must produce a REAL drawdown everywhere —
        # the raw cumulative of the all-positive value column would
        # give 0.0 and both engines would agree on the degenerate
        # answer (the invariant the oracle can't check)
        assert r.max_drawdown > 0, r
        assert r.max_runup > 0, r
        assert 0 <= r.underwater_days <= r.n_days
        assert 0.0 <= r.underwater_share <= 1.0


def test_ccf_bounded_and_peak_pairs_at_lag0(spark):
    rows = {r.lag: r for r in _run(spark, "ts_cross_correlation_lead_lag")}
    assert set(rows) == set(range(-7, 8))
    n0 = rows[0].n_pairs
    for lag, r in rows.items():
        assert abs(r.ccf) <= 1.0
        assert r.n_pairs <= n0, "overlap can only shrink with |lag|"
        assert r.n_pairs >= 2


def test_anderson_darling_positive(spark):
    (r,) = _run(spark, "stats_anderson_darling_2s")
    assert r.n1 > 0 and r.n2 > 0
    assert r.n_support > 1
    assert r.a2_stat >= 0.0


def test_odds_ratio_ci_brackets_estimate(spark):
    rows = _run(spark, "stats_odds_ratio_ci")
    assert rows
    for r in rows:
        assert min(r.a, r.b, r.c, r.d) > 0
        assert r.ci_lo <= r.odds_ratio <= r.ci_hi
        assert (r.ci_lo > 1.0 or r.ci_hi < 1.0) == r.significant_5pct


def test_sign_test_conserves_pairs(spark):
    (r,) = _run(spark, "stats_sign_test_lag7")
    assert r.n_pos + r.n_neg == r.n_pairs
    assert r.n_pairs > 0
    assert (abs(r.z_stat) > 1.96) == r.significant_5pct


def test_hodges_lehmann_pair_mass_and_range(spark):
    (r,) = _run(spark, "stats_hodges_lehmann_shift")
    li = load_table(spark, SF01, "lineitem")
    n_r = li.filter(F.col("l_returnflag") == "R").count()
    n_n = li.filter(F.col("l_returnflag") == "N").count()
    assert r.n_pairs == n_r * n_n, "histogram cross join must conserve mass"
    assert -49.0 <= r.hl_shift <= 49.0
    assert -49.0 <= r.mean_shift <= 49.0


def test_adamic_adar_sorted_positive(spark):
    rows = _run(spark, "graph_adamic_adar")
    assert rows, "sparsified graph must leave predictable non-edges"
    prev = float("inf")
    for r in rows:
        assert r.n_common >= 1
        assert r.aa_score > 0
        assert r.aa_score <= prev + 1e-9
        prev = r.aa_score
        assert r.u < r.v


def test_kmv_estimates_track_exact(spark):
    rows = _run(spark, "sketch_kmv_set_ops")
    assert len(rows) == 10, "5 event types -> 10 unordered pairs"
    for r in rows:
        assert r.exact_inter <= r.exact_union
        assert r.est_union > 0
        # KMV with k = D/4 has ~1/sqrt(k) relative error; 3x is a
        # generous structural bound that still catches a broken hash
        assert 0.3 * r.exact_union <= r.est_union <= 3.0 * r.exact_union
        assert r.est_inter <= r.est_union + 1e-9


def test_ams_f2_estimator_sane(spark):
    rows = _run(spark, "sketch_ams_f2")
    assert rows
    for r in rows:
        assert r.f2_exact > 0
        assert r.f2_est >= 0
        assert r.rel_err >= 0


def test_linear_counting_near_exact_at_low_load(spark):
    rows = _run(spark, "sketch_linear_counting")
    assert rows
    for r in rows:
        assert r.filled <= r.exact_distinct
        assert r.est_distinct >= r.filled - 1e-6
        # m >= 4n by construction -> load factor <= 0.25 -> LC is
        # near-exact; 10% is far above the expected error
        assert r.rel_err < 0.10
        assert r.m_buckets >= 4 * r.exact_distinct - 3


def test_schema_evolution_conserves_customers(spark):
    rows = {r.tier: r for r in _run(spark, "cdc_schema_evolution_merge")}
    cu = load_table(spark, SF01, "customer")
    total = cu.count()
    n_updated = cu.filter(F.col("c_custkey") % 3 == 0).count()
    assert sum(r.n_customers for r in rows.values()) == total
    assert rows["v1-legacy"].n_customers == total - n_updated
    assert set(rows) <= {"v1-legacy", "gold", "silver", "bronze"}


def test_dlq_replay_completeness(spark):
    rows = _run(spark, "cdc_dlq_replay")
    cu = load_table(spark, SF01, "customer")
    assert sum(r.n_customers for r in rows) == cu.count()
    for r in rows:
        # every quarantined row must come back exactly once, clamped
        assert r.n_quarantined_replayed == r.n_clamped_zero
        assert r.sum_final_bal >= 0


def test_association_rules_measure_bounds(spark):
    rows = _run(spark, "basket_association_rules")
    assert rows
    for r in rows:
        assert 0 < r.confidence <= 1.0
        assert r.lift > 0
        if r.confidence == 1.0:
            assert r.conviction is None
        else:
            assert r.conviction is not None and r.conviction > 0
        assert r.n_both >= 2


def test_turning_points_bounds(spark):
    (r,) = _run(spark, "ts_turning_points_test")
    assert 0 <= r.n_turning_points <= r.n_days - 2
    assert abs(r.expected_tp - 2.0 * (r.n_days - 2) / 3.0) < 0.01
    assert (abs(r.z_stat) > 1.96) == r.significant_5pct


def test_isotonic_fit_is_monotone_and_mass_preserving(spark):
    rows = sorted(_run(spark, "ml_isotonic_calibration_pav"), key=lambda r: r.bin)
    assert rows
    prev = -1.0
    for r in rows:
        assert 0.0 <= r.iso_rate <= 1.0
        assert r.iso_rate >= prev - 1e-9, "PAV fit must be non-decreasing"
        prev = r.iso_rate
    # the isotonic solution preserves the weighted mean of the raw rates
    tot = sum(r.n for r in rows)
    raw_mean = sum(r.raw_rate * r.n for r in rows) / tot
    iso_mean = sum(r.iso_rate * r.n for r in rows) / tot
    assert abs(raw_mean - iso_mean) < 1e-3


def test_mcc_panel_consistency(spark):
    (r,) = _run(spark, "ml_eval_mcc_youden")
    assert -1.0 <= r.mcc <= 1.0
    assert -1.0 <= r.youden_j <= 1.0
    assert abs(r.balanced_acc - (r.youden_j + 1.0) / 2.0) < 1e-3
    assert r.tp + r.fp + r.fn + r.tn > 0


def test_next_event_split_no_leakage(spark):
    rows = _run(spark, "ml_next_event_bigram_acc")
    assert rows
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0
        assert r.train_support > 0
        assert r.eval_n > 0
        assert r.predicted_next in {
            "click", "view", "purchase", "signup", "error",
        }


def test_two_nn_dim_positive_and_ambient_bounded(spark):
    rows = _run(spark, "emb_two_nn_intrinsic_dim")
    assert rows
    for r in rows:
        assert r.n_used > 0
        # the MLE is positive; with LSH-candidate neighbors on an
        # isotropic 64-dim fixture it can exceed the ambient dim due
        # to candidate truncation, but not absurdly
        assert 0 < r.id_hat < 500


def test_triplet_margins_bounded(spark):
    rows = _run(spark, "emb_triplet_margin_stats")
    assert rows
    for r in rows:
        assert 0.0 <= r.violation_rate <= 1.0
        assert -2.0 <= r.avg_margin <= 2.0
        assert r.n_triplets > 0


def test_mrr_map_bounds(spark):
    rows = _run(spark, "search_mrr_map_eval")
    assert len(rows) == 3, "3 derived 2-term queries"
    for r in rows:
        assert 0 < r.rr <= 1.0
        assert 0 <= r.ap_at_10 <= 1.0
        assert r.n_relevant <= r.n_matched


def test_rocchio_expansion_changes_ranking_honestly(spark):
    rows = _run(spark, "search_rocchio_prf")
    assert len(rows) == 10
    prev = float("inf")
    n_seeds = 0
    for r in rows:
        assert r.score_expanded <= prev + 1e-9
        prev = r.score_expanded
        # beta=0.5 expansion only ADDS weighted score mass
        assert r.score_expanded >= r.score_initial - 1e-9
        n_seeds += int(r.is_prf_seed)
    assert n_seeds >= 1, "at least one seed should survive re-ranking"


def test_croston_forecast_consistency(spark):
    rows = _run(spark, "ts_croston_intermittent")
    assert len(rows) == 5
    for r in rows:
        assert r.n_demand_days > 1
        assert r.croston_z > 0
        assert r.croston_p >= 1.0, "inter-demand interval is >= 1 day"
        # forecast = z/p must sit below the mean size (p >= 1)
        assert r.forecast_per_day <= r.croston_z + 1e-6


def test_gumbel_return_level_beyond_mean(spark):
    (r,) = _run(spark, "stats_gumbel_block_maxima")
    assert r.n_blocks > 20
    assert r.beta > 0
    # the 12-block return level must exceed the Gumbel location
    assert r.return_level_12blk > r.mu


def test_apdex_bounds(spark):
    rows = _run(spark, "dash_apdex_fulfillment")
    assert rows
    for r in rows:
        assert 0.0 <= r.apdex <= 1.0
        assert r.t_days >= 0
        # T = median latency -> at least half the rows are satisfied
        # in the pooled population; per class it can dip, but apdex
        # can never be below the satisfied share alone
        assert r.n_lineitems > 0


def test_cooccur_lift_sorted_and_positive(spark):
    rows = _run(spark, "text_doc_cooccur_lift")
    assert rows
    prev = float("inf")
    for r in rows:
        assert r.lift > 0
        assert r.lift <= prev + 1e-9
        prev = r.lift
        assert r.tok_a < r.tok_b
        assert r.n_both >= 2


def test_mst_is_spanning_and_acyclic(spark):
    rows = _run(spark, "graph_mst_boruvka")
    # V-1 edges spanning V nodes with no cycle (union-find check)
    nodes = {r.u for r in rows} | {r.v for r in rows}
    assert len(rows) == len(nodes) - 1
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ru, rv = find(r.u), find(r.v)
        assert ru != rv, f"cycle via edge ({r.u},{r.v})"
        parent[ru] = rv
        assert r.n_trades > 0
    roots = {find(n) for n in nodes}
    assert len(roots) == 1, "MST must be connected"


def test_permutation_importance_orders_features(spark):
    rows = {r.feature: r for r in _run(spark, "ml_permutation_importance_det")}
    assert set(rows) == {"l_extendedprice", "l_discount"}
    q, d = rows["l_extendedprice"], rows["l_discount"]
    assert q.rmse_base == d.rmse_base
    # price drives net revenue by construction; discount is a small
    # multiplicative correction — permuting price must hurt far more
    assert q.delta_rmse > 10 * max(d.delta_rmse, 0.0)
    assert q.delta_rmse > 0
    assert d.delta_rmse > 0


def test_cochran_armitage_consistency(spark):
    (r,) = _run(spark, "stats_cochran_armitage_trend")
    assert r.n_levels >= 5
    assert r.chi2_trend >= 0
    assert abs(r.z_trend * r.z_trend - r.chi2_trend) < 0.01
    assert (r.chi2_trend > 3.8415) == r.significant_5pct


def test_survey_ratio_estimator_close_to_truth(spark):
    (r,) = _run(spark, "ml_survey_ratio_estimator")
    assert r.n_sample > 0
    assert 0.05 < r.n_sample / r.n_pop < 0.2, "md5 sample should be ~10%"
    assert r.ratio_hat > 0
    # 10% of thousands of orders: the ratio estimate lands well
    # within 20% of the true total
    assert r.rel_err < 0.2


def test_textrank_scores_form_distribution(spark):
    rows = _run(spark, "text_textrank_keywords")
    assert len(rows) == 10
    prev = float("inf")
    for r in rows:
        assert 0 < r.rank < 1
        assert r.rank <= prev + 1e-12
        prev = r.rank
        assert len(r.keyword) >= 4


def test_h_index_histogram_conserves_users(spark):
    rows = _run(spark, "win_h_index_users")
    ev = load_table(spark, SF01, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert len(rows) > 1, "h distribution must not collapse to one band"
    for r in rows:
        assert r.h_index >= 0


def test_variance_ratio_positive(spark):
    (r,) = _run(spark, "ts_variance_ratio")
    assert r.n_days > 20
    assert r.vr_5 > 0
    assert (abs(r.z_stat) > 1.96) == r.not_iid_5pct


def test_bh_stepup_monotone(spark):
    rows = sorted(_run(spark, "stats_benjamini_hochberg"), key=lambda r: r.p_rank)
    assert len(rows) == 25
    # p sorted by rank; rejected set is a prefix of the ranking
    prev_p = -1.0
    seen_accept = False
    for r in rows:
        assert r.p_value >= prev_p - 1e-12
        prev_p = r.p_value
        if not r.rejected_fdr10:
            seen_accept = True
        else:
            assert not seen_accept, "rejections must form a rank prefix"
        assert 0.0 <= r.p_value <= 1.0


def test_cochran_q_cells_bounded(spark):
    (r,) = _run(spark, "stats_cochran_q_weeks")
    assert r.n_users > 0
    for c in (r.active_p1, r.active_p2, r.active_p3):
        assert 0 <= c <= r.n_users
    assert r.q_stat >= 0
    assert (r.q_stat > 5.991) == r.significant_5pct


def test_littles_law_holds_approximately(spark):
    (r,) = _run(spark, "ops_littles_law_check")
    assert r.n_sessions > 0
    assert r.w_avg_sec >= 1800, "every session includes the 30-min close-out"
    # independently sampled concurrency must agree with lambda*W
    # within sampling/edge error
    assert 0.5 <= r.ratio <= 1.5
    assert abs(r.l_littles - r.lambda_per_sec * r.w_avg_sec) < 0.01 * r.l_littles + 0.01


def test_gmm_components_ordered_and_normalized(spark):
    rows = sorted(_run(spark, "ml_gmm_em_1d"), key=lambda r: r.component)
    assert len(rows) == 2
    c1, c2 = rows
    assert abs(c1.weight_pi + c2.weight_pi - 1.0) < 1e-6
    assert 0 < c1.weight_pi < 1
    assert c1.mu_log < c2.mu_log, "moment init orders the components"
    assert c1.sigma_log > 0 and c2.sigma_log > 0
    import math

    assert c1.mu_price == pytest.approx(math.exp(c1.mu_log), rel=0.01)
    # separation: the two means must not collapse in 5 iterations
    assert c2.mu_log - c1.mu_log > 0.1


def test_two_prop_power_bounds(spark):
    (r,) = _run(spark, "stats_two_prop_power")
    assert r.n1 > 0 and r.n2 > 0
    assert 0.0 < r.p1 < 1.0 and 0.0 < r.p2 < 1.0
    assert 0.0 <= r.power_observed <= 1.0
    if r.observed_diff > 0:
        assert r.n_per_arm_80pct is not None and r.n_per_arm_80pct > 0


def test_spectral_entropy_bounds(spark):
    rows = _run(spark, "ts_spectral_entropy")
    assert rows
    for r in rows:
        assert r.n_periods == 13
        assert 0.0 <= r.spectral_entropy <= 1.0 + 1e-9
        # AM-GM: flatness in (0, 1]
        assert 0.0 < r.spectral_flatness <= 1.0 + 1e-9


def test_scd2_audit_invariants_hold(spark):
    (r,) = _run(spark, "dq_scd2_integrity_audit")
    # the SCD2 operator must produce a TILING history
    assert r.overlap_violations == 0
    assert r.gap_violations == 0
    assert r.version_violations == 0
    assert r.keys_multi_current == 0
    assert r.n_versions >= r.n_keys
    assert r.max_versions_per_key >= 2, "updates must create versions"
    assert r.keys_closed_out > 0, "deletes must close keys out"


def test_platt_reproduces_base_rate(spark):
    (r,) = _run(spark, "ml_platt_scaling")
    # Newton solves the score equation: fitted mean == empirical rate
    assert abs(r.avg_pred - r.base_rate) < 1e-3
    assert 0.0 < r.base_rate < 1.0


def test_friedman_bounds(spark):
    (r,) = _run(spark, "stats_friedman_test")
    assert r.n_blocks > 10
    # Q is bounded by n*(k-1) for k=5 with integer ranks
    assert 0 <= r.q_stat <= r.n_blocks * 4 + 1e-9
    assert (r.q_stat > 9.488) == r.significant_5pct


def test_modularity_identities(spark):
    rows = _run(spark, "graph_modularity_regions")
    assert len(rows) == 5
    q = sum(r.q_contribution for r in rows)
    assert -0.5 <= q <= 1.0
    total_internal = sum(r.internal_weight for r in rows)
    total_degree = sum(r.degree_weight for r in rows)
    # every edge contributes its weight twice to the degree sum
    assert total_degree == 2 * total_internal + 2 * (
        total_degree // 2 - total_internal
    )
    for r in rows:
        assert 2 * r.internal_weight <= r.degree_weight


def test_median_ci_brackets_median(spark):
    (r,) = _run(spark, "stats_median_ci_binomial")
    assert r.ci_lo <= r.median_price <= r.ci_hi
    assert r.lo_rank < r.n / 2 < r.hi_rank
    # the order-statistic CI tightens as sqrt(n); it must be narrow
    # relative to the price range but strictly positive-width
    assert r.ci_hi > r.ci_lo


def test_ece_bounds_and_consistency(spark):
    (r,) = _run(spark, "ml_calibration_ece")
    assert 0.0 <= r.ece <= 1.0
    assert r.ece <= r.mce <= 1.0
    assert abs(r.signed_gap) <= r.ece + 1e-9
    assert r.n_bins <= 20
