"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import __spark_entry__ as se


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"classification", "cnt"}


def test_registry_consistency():
    qs = se.queries()
    oracles = se.oracle_sql()
    assert qs, "registry must not be empty"
    assert set(oracles) <= set(qs)


def test_all_queries_run_sf0001(spark, sf_dir):
    for name, fn in se.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
