"""Cross-scale proof for the exact set-similarity joins at sf0.1.

The full-corpus DuckDB oracles for jaccard/containment are brute-force
all-pairs joins kept quadratic BY DESIGN, so the registry gate skips
them at sf0.1 (25M candidate pairs of list_intersect is ~an hour of
DuckDB).  This test closes that gap with a SAMPLED proof: a
deterministic 1/5 id-slice of the sf0.1 corpus (1000 docs -> 500k
ordered pairs, seconds of brute force) run through the REAL operators
and equated value-for-value with DuckDB — the same engines, the same
scale-factor data, a tractable oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
    containment_join,
    jaccard_threshold_join,
)
from aiven_challenge2_cdc_sharing_spark.tables import load_table

SF01 = "/root/testdata/sf0.1"

_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM '{path}/documents.parquet' WHERE doc_id % 5 = 0
),
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk FROM docs
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
  FROM toks
)
"""


@pytest.mark.parametrize("threshold", [0.5])
def test_jaccard_join_matches_duckdb_at_sf01_sample(spark, threshold):
    docs = load_table(spark, SF01, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_threshold_join(
            docs, "doc_id", "text", threshold
        ).collect()
    }
    sql = (
        _ORACLE.format(path=SF01)
        + f"""
, scored AS (
SELECT a.doc_id AS ia, b.doc_id AS ib,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / len(list_distinct(a.s || b.s)), 6) AS j
FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
SELECT * FROM scored WHERE j >= {threshold}
"""
    )
    expect = {(a, b): j for a, b, j in duckdb.sql(sql).fetchall()}
    assert got == expect
    assert len(got) > 0, "sample produced no pairs — slice is degenerate"


def test_containment_join_matches_duckdb_at_sf01_sample(spark):
    docs = load_table(spark, SF01, "documents").filter(
        F.col("doc_id") % 5 == 0
    )
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(docs, "doc_id", "text", 0.8).collect()
    }
    sql = (
        _ORACLE.format(path=SF01)
        + """
, scored AS (
SELECT a.doc_id AS ia, b.doc_id AS ib,
       round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 6) AS c
FROM sh a JOIN sh b ON a.doc_id <> b.doc_id)
SELECT * FROM scored WHERE c >= 0.8
"""
    )
    expect = {(a, b): c for a, b, c in duckdb.sql(sql).fetchall()}
    assert got == expect
    assert len(got) > 0
