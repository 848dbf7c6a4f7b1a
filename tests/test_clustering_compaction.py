"""Connected-components dedup clustering + parquet compaction."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.operators.clustering import (
    connected_components,
    dedup_clusters,
)
from aiven_challenge2_cdc_sharing_spark.sources.catalog import compact_parquet
from aiven_challenge2_cdc_sharing_spark.tables import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cc_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_dedup_clusters_survivors(spark):
    docs = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(2, 3), (3, 4)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["is_survivor"])
           for r in dedup_clusters(docs, pairs).collect()}
    # 2,3,4 cluster under min id 2; everything else is its own survivor
    assert out[2] == (2, True) and out[3] == (2, False) and out[4] == (2, False)
    for singleton in (1, 5, 6, 7):
        assert out[singleton] == (singleton, True)


def test_compact_parquet_reduces_files(spark, sf_dir, tmpdir):
    li = load_table(spark, sf_dir, "lineitem")
    loc = f"{tmpdir}/li"
    li.repartition(40).write.parquet(loc)  # simulate small-files buildup
    n_before = len(glob.glob(f"{loc}/part-*.parquet"))
    rows_before = spark.read.parquet(loc).count()
    n_target = compact_parquet(spark, loc, target_file_bytes=10 * 1024 * 1024,
                               sort_by=("l_orderkey",))
    n_after = len(glob.glob(f"{loc}/part-*.parquet"))
    assert n_before == 40
    assert n_after == n_target < n_before
    assert spark.read.parquet(loc).count() == rows_before