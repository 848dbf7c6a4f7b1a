"""Multi-format ingest: round-trip fidelity, quarantine capture,
schema evolution, and pushdown survival in the second columnar format."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aiven_challenge2_cdc_sharing_spark.sources import formats

TRICKY = [
    Row(id=1, text='plain'),
    Row(id=2, text='comma, inside'),
    Row(id=3, text='quote " inside'),
    Row(id=4, text='both ", and\nnewline'),
    Row(id=5, text=None),
    Row(id=6, text=''),
]

TRICKY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _sorted_rows(df):
    return sorted(
        ((r["id"], r["text"]) for r in df.collect()), key=lambda t: t[0]
    )


def test_csv_roundtrip_tricky_strings(spark, tmp_path):
    df = spark.createDataFrame(TRICKY, TRICKY_SCHEMA)
    path = str(tmp_path / "tricky_csv")
    formats.write_csv(df, path)
    back = formats.valid_rows(formats.read_csv(spark, path, TRICKY_SCHEMA))
    got = _sorted_rows(back)
    want = _sorted_rows(df)
    # CSV cannot distinguish NULL from empty string without a nullValue
    # sentinel; both sides read back as NULL — normalize for compare.
    want = [(i, None if t == "" else t) for i, t in want]
    got = [(i, None if t == "" else t) for i, t in got]
    assert got == want


def test_jsonl_roundtrip_tricky_strings(spark, tmp_path):
    df = spark.createDataFrame(TRICKY, TRICKY_SCHEMA)
    path = str(tmp_path / "tricky_jsonl")
    formats.write_jsonl(df, path)
    back = formats.valid_rows(formats.read_jsonl(spark, path, TRICKY_SCHEMA))
    # JSON distinguishes null from "" exactly
    assert _sorted_rows(back) == _sorted_rows(df)


def test_orc_roundtrip_exact(spark, tmp_path):
    df = spark.createDataFrame(TRICKY, TRICKY_SCHEMA)
    path = str(tmp_path / "tricky_orc")
    formats.write_orc(df, path)
    back = formats.read_orc(spark, path)
    assert _sorted_rows(back) == _sorted_rows(df)
    assert back.schema == df.schema


def test_csv_quarantine_captures_malformed_rows(spark, tmp_path):
    path = tmp_path / "dirty"
    os.makedirs(path)
    (path / "part-0.csv").write_text(
        "id,text\n"
        "1,good\n"
        "not_an_int,bad row\n"
        "2,also good\n"
    )
    read = formats.read_csv(spark, str(path), TRICKY_SCHEMA)
    valid = formats.valid_rows(read)
    bad = formats.quarantined_rows(read)
    assert sorted(r["id"] for r in valid.collect()) == [1, 2]
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not_an_int" in bad_rows[0][formats.CORRUPT_COL]


def test_jsonl_quarantine_and_missing_fields(spark, tmp_path):
    path = tmp_path / "dirty_json"
    os.makedirs(path)
    (path / "part-0.json").write_text(
        '{"id": 1, "text": "full row"}\n'
        '{"id": 2}\n'            # missing field -> NULL (schema evolution)
        'this is not json\n'     # malformed -> quarantine
    )
    read = formats.read_jsonl(spark, str(path), TRICKY_SCHEMA)
    valid = formats.valid_rows(read)
    bad = formats.quarantined_rows(read)
    rows = {r["id"]: r["text"] for r in valid.collect()}
    assert rows == {1: "full row", 2: None}
    assert len(bad.collect()) == 1


def test_orc_filter_pushdown_survives(spark, tmp_path, sf_dir):
    """Predicate pushdown must reach the ORC scan like it does parquet."""
    from aiven_challenge2_cdc_sharing_spark.tables import load_table

    part = load_table(spark, sf_dir, "part")
    path = str(tmp_path / "part_orc")
    formats.write_orc(part, path)
    plan = (
        formats.read_orc(spark, path)
        .filter(F.col("p_size") > 40)
        .select("p_partkey", "p_size")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(p_size), GreaterThan(p_size,40)" in plan
    # column pruning: the scan reads 2 columns, not 6
    assert "ReadSchema: struct<p_partkey:bigint,p_size:int>" in plan
