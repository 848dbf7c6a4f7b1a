"""Kafka wire-schema decode parity + schema-on-read evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.cdc import (
    generate_envelope_log,
    latest_snapshot,
    to_wire,
    unwrap,
)
from aiven_challenge2_cdc_sharing_spark.sources.kafka_shape import (
    decode_kafka_records,
    kafka_stream_reader,
)


def _as_kafka_records(wire):
    """Shape to_wire output exactly like the Kafka source schema."""
    return wire.select(
        F.encode("key_json", "UTF-8").cast("binary").alias("key"),
        F.encode("value_json", "UTF-8").cast("binary").alias("value"),
        F.col("partition"),
        F.col("offset"),
    )


def rows_set(df):
    return {tuple(str(x) for x in r) for r in df.select(*sorted(df.columns)).collect()}


def test_kafka_decode_matches_direct_snapshot(spark, sf_dir):
    unwrapped = unwrap(generate_envelope_log(spark, sf_dir))
    direct = latest_snapshot(unwrapped)
    records = _as_kafka_records(to_wire(unwrapped))
    decoded = decode_kafka_records(records)
    via_kafka = latest_snapshot(
        decoded, key_cols=("id",), order_cols=("offset",)
    ).drop("offset")
    assert rows_set(direct) == rows_set(via_kafka)


def test_decode_tolerates_schema_evolution(spark, sf_dir):
    """Upstream adds a column: schema-on-read must ignore unknown
    fields, not fail (schemaless JSON wire, terraform/main.tf:261-264)."""
    wire = to_wire(unwrap(generate_envelope_log(spark, sf_dir)))
    evolved = wire.withColumn(
        "value_json",
        F.when(
            F.col("value_json").isNotNull(),
            F.regexp_replace(
                "value_json", r"\}$", ',"new_upstream_col":"surprise"}'
            ),
        ),
    )
    decoded = decode_kafka_records(_as_kafka_records(evolved))
    snap = latest_snapshot(
        decoded, key_cols=("id",), order_cols=("offset",)
    ).drop("offset")
    base = latest_snapshot(unwrap(generate_envelope_log(spark, sf_dir)))
    assert rows_set(snap) == rows_set(base)


def test_wire_offsets_unique_and_ordered(spark, sf_dir):
    """The fabricated log must satisfy the broker invariant: offsets are
    unique and strictly ordered per partition, one key's history lives
    on one partition, and each delete's tombstone directly follows it."""
    wire = to_wire(unwrap(generate_envelope_log(spark, sf_dir)))
    rows = wire.collect()
    seen = set()
    for r in rows:
        key = (r["partition"], r["offset"])
        assert key not in seen, f"duplicate offset {key}"
        seen.add(key)
    # per-key single partition
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key_json"], set()).add(r["partition"])
    assert all(len(parts) == 1 for parts in by_key.values())
    # events ordered by offset agree with (ts_ms, seq) ordering: the
    # decoded latest-state equals the direct snapshot (covered above),
    # and tombstones (value NULL) sit at odd offsets right after their
    # delete record
    for r in rows:
        if r["value_json"] is None:
            assert r["offset"] % 2 == 1
            assert (r["partition"], r["offset"] - 1) in seen


def test_kafka_reader_builds(spark):
    """The production reader must at least configure without a broker."""
    reader = kafka_stream_reader(spark, "broker:9092")
    assert reader is not None