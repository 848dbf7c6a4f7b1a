"""Invariant pins for the round-8 query batch (built in round 7).

Each family gets a structural invariant the oracle hash can't express
on its own: conservation laws (attribution credit sums to the purchase
count, Shapley additivity, waterfall shares sum to 1), guarantee
checks (conformal coverage ~>= target, KM monotone non-increasing,
NDCG <= 1), cross-operator consistency (atomic CDC apply has zero
orphans, two-level lag equals the per-op event census, eval-sweep
recall is monotone in threshold), and whitening actually whitens.
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


def test_kaplan_meier_monotone_and_bounded(spark):
    rows = _run(spark, "surv_kaplan_meier_monthly")
    assert rows, "KM curve must have event months"
    s_prev = 1.0
    risk_prev = None
    for r in sorted(rows, key=lambda r: r.month):
        assert 0.0 <= r.s_km <= s_prev + 1e-9, "S(t) must be non-increasing"
        assert r.n_events >= 1
        if risk_prev is not None:
            assert r.n_risk <= risk_prev, "at-risk set only shrinks"
        s_prev, risk_prev = r.s_km, r.n_risk


def test_txn_snapshot_atomic_is_consistent(spark):
    rows = {r.apply_mode: r for r in _run(spark, "cdc_txn_snapshot_consistency")}
    atomic, naive = rows["atomic"], rows["naive"]
    assert atomic.n_orphan_lineitems == 0
    # the fixture itself has orders with zero lineitems (231 at
    # sf0.01), so atomic childless == that base rate; the SKEW-INDUCED
    # childless orders appear only under naive apply
    assert naive.n_childless_orders > atomic.n_childless_orders
    # the skewed apply must actually demonstrate the orphan hazard
    assert naive.n_orphan_lineitems > 0
    # naive lags the child table, so it can only have FEWER lineitems
    assert naive.n_lineitems_live <= atomic.n_lineitems_live
    # both modes see the same order log (cut on commit time either way)
    assert naive.n_orders_live == atomic.n_orders_live


def test_minhash_eval_recall_monotone_in_threshold(spark):
    rows = sorted(
        _run(spark, "dedup_minhash_eval_sweep"), key=lambda r: r.threshold
    )
    assert [r.threshold for r in rows] == [0.3, 0.4, 0.5, 0.6]
    recalls = [r.recall_t for r in rows if r.recall_t is not None]
    # P[collide] = 1-(1-J)^bands rises with J, so recall over a higher
    # threshold's (more similar) truth set can never decrease
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    for r in rows:
        assert r.tp <= r.n_true and r.tp <= r.n_cand


def test_conformal_coverage_hits_target(spark):
    (row,) = _run(spark, "ml_conformal_interval")
    # split-conformal marginal guarantee: coverage >= target up to
    # finite-sample wobble (one-sided slack ~ 1/sqrt(n_eval))
    slack = 2.0 / math.sqrt(row.n_eval)
    assert row.coverage >= row.target - slack
    assert row.coverage <= 1.0
    assert row.n_train > row.n_cal > 0 and row.n_eval > 0


def test_sprt_crossing_day_consistent_with_decision(spark):
    for r in _run(spark, "ab_sprt_sequential"):
        if r.decision == "accept_h1":
            assert r.first_accept_day is not None
        elif r.decision == "accept_h0":
            assert r.first_reject_day is not None
        assert r.max_llr >= r.final_llr - 1e-9


def test_pq_adc_returns_k_per_query(spark):
    rows = _run(spark, "emb_pq_adc_topk")
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.vec_id != r.query_id, "self must be excluded"
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert len(rs) == 5
        scores = [r.adc_score for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_shapley_additivity_per_flag(spark):
    for r in _run(spark, "ml_shapley_revenue_split"):
        assert abs(r.additivity_check) < 1e-3, (
            "phi_qty + phi_price must equal revenue - E[q]E[p] exactly"
        )


def test_brier_decomposition_identity(spark):
    (r,) = _run(spark, "ml_brier_decomposition")
    # brier = reliability - resolution + uncertainty + within-bin score
    # variance; the residual is the (non-negative) within-bin term
    residual = r.brier - (r.reliability - r.resolution + r.uncertainty)
    assert residual >= -1e-4
    assert 0.0 <= r.uncertainty <= 0.25 + 1e-9


def test_threshold_sweep_monotone_counts(spark):
    rows = sorted(_run(spark, "ml_threshold_sweep_f1"), key=lambda r: r.threshold)
    for a, b in zip(rows, rows[1:]):
        assert b.tp <= a.tp, "raising the threshold can only lose TPs"
        assert b.fp <= a.fp
        assert b.fn >= a.fn


def test_whitening_actually_whitens(spark):
    for r in _run(spark, "emb_whitening_2d"):
        assert abs(r.post_var1 - 1.0) < 1e-2
        assert abs(r.post_var2 - 1.0) < 1e-2
        assert abs(r.post_cov) < 1e-2


def test_ndcg_bounded_and_gold_optimal(spark):
    (r,) = _run(spark, "search_ndcg_at_10")
    assert 0.0 < r.ndcg_at_10 <= 1.0 + 1e-9
    assert r.dcg_at_10 <= r.idcg_at_10 + 1e-9


def test_time_decay_credit_conserves_purchases(spark):
    rows = _run(spark, "funnel_time_decay_attribution")
    total_credit = sum(r.total_credit for r in rows)
    # every attributed purchase distributes exactly one credit unit;
    # purchases with no trailing-24h touch are excluded by the join
    assert total_credit == pytest.approx(round(total_credit), abs=0.05)
    assert total_credit > 0


def test_waterfall_shares_sum_to_one_per_month(spark):
    rows = _run(spark, "dash_mom_revenue_waterfall")
    by_m = {}
    for r in rows:
        if r.share_of_total_delta is not None:
            by_m.setdefault(r.month_1995, []).append(r.share_of_total_delta)
    assert by_m
    for m, shares in by_m.items():
        assert sum(shares) == pytest.approx(1.0, abs=0.01)


def test_rfm_scores_partition_customers(spark):
    rows = _run(spark, "dash_rfm_segments")
    assert rows
    for r in rows:
        assert 1 <= r.r <= 5 and 1 <= r.f <= 5 and 1 <= r.m <= 5


def test_hits_l1_normalized(spark):
    rows = _run(spark, "graph_hits_nation_trade")
    # top-10 of an L1-normalized 25-node score vector: sums <= 1 and
    # every score positive (the graph is strongly connected enough)
    assert 0.0 < sum(r.authority for r in rows) <= 1.0 + 1e-6
    assert 0.0 < sum(r.hub for r in rows) <= 1.0 + 1e-6


def test_harmonic_centrality_bounds(spark):
    rows = _run(spark, "graph_harmonic_centrality")
    n = len(rows)
    for r in rows:
        assert 0 <= r.n_reached <= n - 1
        # harmonic <= n_reached (every term <= 1)
        assert r.harmonic_centrality <= r.n_reached + 1e-9


def test_lag_percentile_census_matches_log(spark):
    from aiven_challenge2_cdc_sharing_spark.cdc.generator import (
        generate_envelope_log,
    )

    rows = {r.op: r for r in _run(spark, "cdc_lag_percentiles")}
    log = generate_envelope_log(spark, SF01)
    by_op = {r["op"]: r["cnt"] for r in log.groupBy("op").count().withColumnRenamed("count", "cnt").collect()}
    # every event except the single globally-first one carries a gap
    assert sum(r.n_events for r in rows.values()) == sum(by_op.values()) - 1
    for r in rows.values():
        assert r.p50_gap_ms <= r.p95_gap_ms <= r.p99_gap_ms <= r.max_gap_ms


def test_out_of_order_fraction_bounds(spark):
    rows = _run(spark, "cdc_out_of_order_fraction")
    ops = {r.op for r in rows}
    assert ops == {"c", "u", "d"}
    for r in rows:
        assert 0.0 <= r.ooo_fraction <= 1.0
        assert r.n_out_of_order <= r.n_events
    # inserts interleave behind earlier-keyed updates/deletes, so SOME
    # out-of-order inserts must exist on this workload
    (c_row,) = [r for r in rows if r.op == "c"]
    assert c_row.n_out_of_order > 0


def test_nearest_price_is_truly_nearest(spark):
    import duckdb

    rows = _run(spark, "join_nearest_price")
    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"""
            SELECT a.p_partkey, min(abs(round(a.p_retailprice*100,0)
                                      - round(b.p_retailprice*100,0)))
            FROM '{SF01}/part.parquet' a JOIN '{SF01}/part.parquet' b
              ON b.p_partkey != a.p_partkey
            WHERE a.p_partkey <= 20 GROUP BY 1
            """
        ).fetchall()
    )
    for r in rows:
        assert round(r.price_diff * 100) == truth[r.probe_id], (
            "banded nearest must equal brute-force nearest"
        )


def test_kruskal_wallis_matches_scipy_formula(spark):
    (r,) = _run(spark, "stats_kruskal_wallis")
    assert r.df == 2
    assert r.h_stat >= 0
    assert r.h_tie_corrected >= r.h_stat - 1e-9, (
        "tie correction factor <= 1 inflates H"
    )


def test_record_highs_at_most_events(spark):
    for r in _run(spark, "win_record_high_events"):
        assert 1 <= r.n_records <= r.n_events
        assert r.last_record_pos <= r.n_events


def test_fisher_index_between_laspeyres_paasche(spark):
    for r in _run(spark, "agg_price_index_fisher"):
        lo, hi = sorted((r.laspeyres, r.paasche))
        assert lo - 1e-6 <= r.fisher <= hi + 1e-6, (
            "geometric mean must lie between its factors"
        )
        assert r.n_parts > 0


def test_kfold_rmse_well_formed(spark):
    rows = _run(spark, "ml_kfold_rmse")
    assert sorted(r.fold for r in rows) == [0, 1, 2, 3, 4]
    for r in rows:
        assert r.rmse > 0 and r.n_eval > 0


def test_reciprocity_bounds_and_dyads(spark):
    (r,) = _run(spark, "graph_reciprocity_trade")
    assert 0.0 <= r.reciprocity <= 1.0
    assert r.n_reciprocated == 2 * r.n_mutual_dyads
    assert r.n_reciprocated + r.n_asymmetric_edges == r.n_edges


def test_cooks_distance_sorted_and_positive(spark):
    rows = _run(spark, "stats_cooks_distance_top")
    ds = [r.cooks_d for r in rows]
    assert ds == sorted(ds, reverse=True)
    assert all(d >= 0 for d in ds)
    assert all(0 < r.leverage < 1 for r in rows)


def test_sentence_dedup_rate_bounds(spark):
    for r in _run(spark, "text_sentence_dedup_rate"):
        assert 0.0 <= r.dup_rate < 1.0
        assert r.n_distinct <= r.n_sentences


def test_sequence_gaps_consistent(spark):
    rows = {r.check_name: r for r in _run(spark, "dq_sequence_gaps")}
    for r in rows.values():
        assert r.expected == r.actual + r.missing
        assert r.missing >= 0
    # events cover every day of their span on the fixture
    assert rows["event_days"].missing == 0


def test_mase_consistent_with_maes(spark):
    (r,) = _run(spark, "ts_seasonal_naive_mase")
    assert r.mase == pytest.approx(r.mae_snaive7 / r.mae_naive1, rel=1e-3)
    assert r.seasonal_better == (r.mae_snaive7 < r.mae_naive1)


def test_cr_concentration_ordered(spark):
    for r in _run(spark, "agg_cr_concentration"):
        assert 0.0 < r.cr1 <= r.cr4 <= 1.0 + 1e-9
        assert r.cr4 <= 4.0 * r.cr1 + 1e-9, "top-4 <= 4x the top-1 share"


def test_temporal_coalesce_conserves_customers(spark):
    import duckdb

    rows = _run(spark, "join_temporal_coalesce")
    n_cust = sum(r.n_customers for r in rows)
    con = duckdb.connect()
    truth = con.execute(
        f"SELECT count(DISTINCT o_custkey) FROM '{SF01}/orders.parquet'"
    ).fetchone()[0]
    assert n_cust == truth, "every ordering customer lands in one band"
    for r in rows:
        # a customer's coalesced coverage is at least one 30-day window
        # per period
        assert r.avg_covered_days >= 30 * r.n_periods_band - 1e-9


def test_bigram_cond_entropy_bounds(spark):
    rows = _run(spark, "text_bigram_cond_entropy")
    assert rows
    for r in rows:
        # 0 <= H(W2|W1) <= ln(vocab)
        assert 0.0 <= r.cond_entropy_nats <= math.log(max(r.vocab_w1, 2)) + 5


def test_mean_vector_bias_bounds(spark):
    for r in _run(spark, "emb_mean_vector_bias"):
        # Jensen: ||mean|| <= mean ||x||, so the ratio is in [0, 1]
        assert 0.0 <= r.bias_ratio <= 1.0 + 1e-9


def test_edge_churn_set_algebra(spark):
    (r,) = _run(spark, "graph_edge_churn_periods")
    assert r.n_kept + r.n_removed == r.n_edges_early
    assert r.n_kept + r.n_added == r.n_edges_late
    union = r.n_edges_early + r.n_edges_late - r.n_kept
    assert r.jaccard_overlap == pytest.approx(r.n_kept / union, abs=1e-3)


def test_ljung_box_nonnegative(spark):
    (r,) = _run(spark, "stats_ljung_box")
    assert r.q_stat >= 0
    assert r.df == 5
