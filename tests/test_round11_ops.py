"""Invariant pins for the round-8 (coverage_round11) batches.

The CDC temporal family's pins are conservation laws the generator
arithmetic guarantees: PIT probe states must account for every
(key, probe) pair; IVM's maintained aggregates must equal the
recompute (the agreement flags are IN the hashed output, but the pin
asserts them directly so a regression fails loudly in pytest too);
tombstone GC splits must partition the delete set; the change feed's
insert/delete counts must reconcile the two snapshot cardinalities;
replay inflation must be exactly the id%11 share.
"""

from __future__ import annotations

import os

import pytest

from aiven_challenge2_cdc_sharing_spark.queries import load_registry

SF001 = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF001), reason="testdata absent"
)


def _run(spark, name, sf=SF001):
    return load_registry()[name].fn(spark, sf).collect()


def _n_customers(spark):
    return (
        spark.read.parquet(f"{SF001}/customer.parquet").count()
    )


def test_pit_probe_states_account_for_every_key(spark):
    rows = _run(spark, "cdc_pit_enrich_probes")
    n = _n_customers(spark)
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r.tag, 0)
        by_tag[r.tag] += r.n_keys
    # every key appears exactly once per probe instant
    assert by_tag == {
        "t_plus_250s": n, "t_plus_750s": n, "t_plus_950s": n
    }
    # at +250s no update has fired yet -> no v2, no absences
    early = {r.phone_state for r in rows if r.tag == "t_plus_250s"}
    assert early == {"phone_v1"}
    # absences appear only after the +900s deletes
    assert not any(
        r.phone_state == "absent" and r.tag != "t_plus_950s" for r in rows
    )


def test_ivm_maintained_equals_recompute(spark):
    rows = _run(spark, "cdc_ivm_agg_maintenance")
    assert {r.classification for r in rows} == {"public", "private"}
    for r in rows:
        assert r.counts_agree and r.sums_agree
        assert r.n_keys == r.n_keys_recomputed
        assert r.phone_sum == r.phone_sum_recomputed
        assert r.n_keys > 0 and r.phone_sum > 0


def test_tombstone_gc_partitions_the_delete_set(spark):
    rows = _run(spark, "cdc_tombstone_gc_audit")
    n = _n_customers(spark)
    n_deleted = sum(1 for ck in range(0, n) if ck % 7 == 0)
    assert sum(r.n_tombstones for r in rows) == n_deleted
    for r in rows:
        assert r.n_gc_eligible + r.n_retained == r.n_tombstones


def test_change_feed_reconciles_snapshot_cardinalities(spark):
    rows = _run(spark, "cdc_change_feed_between_versions")
    n = _n_customers(spark)
    feed = {(r.classification, r.change_type): r.n_keys for r in rows}
    inserts = sum(v for (c, t), v in feed.items() if t == "insert")
    deletes = sum(v for (c, t), v in feed.items() if t == "delete")
    # |V2| - |V1| == inserts - deletes (keys alive finally vs at cut)
    n_final = sum(1 for ck in range(0, n) if ck % 7 != 0)
    assert inserts >= 0 and deletes >= 0
    # V1 cardinality from the feed identity
    n_v1 = n_final - inserts + deletes
    assert 0 < n_v1 <= n_final + deletes


def test_replay_inflation_is_exactly_the_mod11_share(spark):
    rows = _run(spark, "cdc_replay_inflation_audit")
    n = _n_customers(spark)
    assert sum(r.n_inserts for r in rows) == n
    assert sum(r.n_replayed for r in rows) == sum(
        1 for ck in range(0, n) if ck % 11 == 0
    )
    for r in rows:
        assert r.insert_sum_naive >= r.insert_sum_deduped
        assert r.inflation_ratio >= 1.0


def test_density_core_blas_twin_parity(spark):
    """The registry default is the BLAS cogroup scorer since round 9;
    the sequential-fold HOF path is the oracle-exact twin.  They must
    agree up to eps-boundary float flips: n_total exactly (candidate
    generation is identical), n_core and total_eps_neighbors within a
    small boundary tolerance.  (In every measurement so far they are
    bit-identical — this pin is the tripwire for a BLAS library
    change flipping a 6dp-rounded sim at the 0.2 boundary.)"""
    from aiven_challenge2_cdc_sharing_spark.queries.coverage_round6 import (
        _density_core_points_hof,
    )

    blas = {r.label: r for r in _run(spark, "emb_density_core_points")}
    hof = {
        r.label: r
        for r in _density_core_points_hof(spark, SF001).collect()
    }
    assert set(hof) == set(blas)
    for lab in hof:
        assert blas[lab].n_total == hof[lab].n_total
        assert abs(blas[lab].n_core - hof[lab].n_core) <= max(
            1, hof[lab].n_total // 100
        )
        denom = max(1, hof[lab].total_eps_neighbors)
        assert (
            abs(blas[lab].total_eps_neighbors - hof[lab].total_eps_neighbors)
            <= max(2, denom // 500)
        )
