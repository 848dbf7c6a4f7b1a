"""Z-order layout: after zorder_write on (a, b), parquet file-level
min/max ranges must be narrow on BOTH dimensions — vs a linear sort
which is narrow on one and full-width on the other."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from aiven_challenge2_cdc_sharing_spark.operators.layout import zorder_write
from aiven_challenge2_cdc_sharing_spark.tables import load_table


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="zo_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _avg_file_range_fraction(location: str, col: str) -> float:
    """Mean (file max-min)/(global max-min) for a column — lower means
    better skipping for predicates on that column."""
    spans, lo_all, hi_all = [], None, None
    for f in glob.glob(f"{location}/part-*.parquet"):
        md = pq.read_metadata(f)
        lo = hi = None
        for rg in range(md.num_row_groups):
            colmeta = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == col
            )
            st = colmeta.statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        spans.append((lo, hi))
        lo_all = lo if lo_all is None else min(lo_all, lo)
        hi_all = hi if hi_all is None else max(hi_all, hi)
    width = hi_all - lo_all
    return sum((h - l) / width for l, h in spans) / len(spans)


def test_zorder_narrows_both_dimensions(spark, sf_dir, tmpdir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # linear sort on custkey: totalprice stats are full-width per file
    orders.repartitionByRange(8, "o_custkey").sortWithinPartitions(
        "o_custkey"
    ).write.parquet(f"{tmpdir}/linear")
    zorder_write(orders, f"{tmpdir}/zorder", "o_custkey", "o_totalprice")

    lin_cust = _avg_file_range_fraction(f"{tmpdir}/linear", "o_custkey")
    lin_price = _avg_file_range_fraction(f"{tmpdir}/linear", "o_totalprice")
    z_cust = _avg_file_range_fraction(f"{tmpdir}/zorder", "o_custkey")
    z_price = _avg_file_range_fraction(f"{tmpdir}/zorder", "o_totalprice")

    # linear: custkey narrow (~1/8), price full-width (~1.0)
    assert lin_cust < 0.3 and lin_price > 0.8
    # zorder: BOTH dimensions materially narrower than full-width
    assert z_cust < 0.7 and z_price < 0.7, (z_cust, z_price)
    # rows preserved
    assert spark.read.parquet(f"{tmpdir}/zorder").count() == orders.count()