"""Incremental view maintenance: the delta-maintained aggregate must
equal the recomputed one after arbitrary micro-batching, and updates
that don't change the group key must be net no-ops."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.cdc import generate_envelope_log
from aiven_challenge2_cdc_sharing_spark.queries import load_registry
from aiven_challenge2_cdc_sharing_spark.streaming.incremental import (
    apply_agg_deltas,
    classification_deltas,
    run_incremental_counts,
)
from aiven_challenge2_cdc_sharing_spark.streaming.runtime import (
    envelope_file_stream,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ivm_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_counts_equal_recompute(spark, sf_dir, tmpdir):
    log = generate_envelope_log(spark, sf_dir)
    log.repartition(6).write.json(f"{tmpdir}/ev")  # multiple micro-batches

    q = run_incremental_counts(
        envelope_file_stream(spark, f"{tmpdir}/ev"),
        f"{tmpdir}/counts",
        f"{tmpdir}/ck",
    )
    q.awaitTermination(300)
    got = {
        r["classification"]: r["cnt"]
        for r in spark.read.parquet(f"{tmpdir}/counts/counts").collect()
    }
    want = {
        r["classification"]: r["cnt"]
        for r in load_registry()["cdc_count_by_classification"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == want


def test_same_group_update_is_net_noop(spark, sf_dir):
    log = generate_envelope_log(spark, sf_dir)
    updates_only = log.filter(F.col("op") == "u")
    # generator updates change phone, never classification -> all deltas
    # cancel pairwise
    deltas = classification_deltas(updates_only)
    assert deltas.filter(F.col("delta") != 0).count() == 0


def test_apply_deltas_drops_zero_groups(spark):
    counts = spark.createDataFrame(
        [("public", 5), ("private", 1)], "classification string, cnt long"
    )
    deltas = spark.createDataFrame(
        [("private", -1), ("internal", 2)], "classification string, delta long"
    )
    out = {
        r["classification"]: r["cnt"]
        for r in apply_agg_deltas(counts, deltas).collect()
    }
    assert out == {"public": 5, "internal": 2}  # private hit zero, dropped