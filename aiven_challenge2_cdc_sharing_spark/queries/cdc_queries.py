"""CDC pipeline queries — the engine's flagship surface.

Each query runs the *real* CDC algebra (generate envelope log -> unwrap
-> materialize) in Spark; the oracle derives the same expected state
directly in SQL from the deterministic generator rules
(cdc/generator.py), so the whole pipeline — not just the final agg — is
under the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc import (
    from_wire,
    generate_envelope_log,
    latest_snapshot,
    to_wire,
    unwrap,
)
from . import register

# SQL twin of the generator+materializer composition: the live snapshot
# after inserts, phone updates (id%3==0), deletes (id%7==0).
SNAPSHOT_SQL = """
SELECT
  CAST(c_custkey AS INTEGER) AS id,
  c_name AS full_name,
  lower(regexp_replace(c_name, '[^A-Za-z0-9]+', '.', 'g')) || '@example.com' AS email,
  CASE WHEN c_custkey % 3 = 0
       THEN '+1-' || lpad(CAST(c_custkey * 104729 % 10000000 AS VARCHAR), 7, '0')
       ELSE '+1-' || lpad(CAST(c_custkey * 7919 % 10000000 AS VARCHAR), 7, '0')
  END AS phone,
  CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END AS classification,
  make_timestamp((1704067200 + c_custkey) * 1000000) AS created_at
FROM customer
WHERE c_custkey % 7 <> 0
"""


def _snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return latest_snapshot(unwrap(generate_envelope_log(spark, sf_dir)))


@register(
    "cdc_snapshot",
    oracle=SNAPSHOT_SQL,
    doc="S1+P1+P2+W1: envelope log -> unwrap -> last-writer-wins snapshot "
    "(the reference's OpenSearch index as a derived table)",
)
def cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _snapshot(spark, sf_dir)


@register(
    "cdc_count_by_classification",
    oracle=f"""
SELECT classification, count(*) AS cnt
FROM ({SNAPSHOT_SQL})
GROUP BY classification
ORDER BY cnt DESC, classification
""",
    doc="A1: the reference's 'Count by Classification' dashboard "
    "(README.md:150-152) on the materialized snapshot",
)
def cdc_count_by_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _snapshot(spark, sf_dir)
        .groupBy("classification")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "classification")
    )


@register(
    "cdc_new_customers_over_time",
    oracle=f"""
SELECT date_trunc('hour', created_at) AS bucket, count(*) AS cnt
FROM ({SNAPSHOT_SQL})
GROUP BY bucket
ORDER BY bucket
""",
    doc="A2: 'New Customers Over Time' date-histogram (README.md:154-156)",
)
def cdc_new_customers_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _snapshot(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "created_at").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


@register(
    "cdc_recent_customers",
    oracle=f"""
SELECT id, full_name, classification, created_at
FROM ({SNAPSHOT_SQL})
ORDER BY created_at DESC, id DESC
LIMIT 10
""",
    doc="O1: 'Recent 10 Customers' saved search (README.md:158-160)",
)
def cdc_recent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _snapshot(spark, sf_dir)
        .select("id", "full_name", "classification", "created_at")
        .orderBy(F.desc("created_at"), F.desc("id"))
        .limit(10)
    )


@register(
    "cdc_wire_roundtrip",
    oracle=SNAPSHOT_SQL,
    doc="S3+S4+P3+P4: unwrap -> JSON wire (keyed records + tombstones) -> "
    "schema-on-read -> snapshot; must equal the direct snapshot",
)
def cdc_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    wire = to_wire(unwrap(generate_envelope_log(spark, sf_dir)))
    decoded = from_wire(wire)
    return latest_snapshot(decoded, key_cols=("id",), order_cols=("offset",)).drop(
        "offset"
    )


@register(
    "cdc_kafka_wire_decode",
    oracle=SNAPSHOT_SQL,
    doc="S1/S3/T8 Kafka wire-contract twin: the envelope log serialized "
    "to Kafka's BINARY key/value wire schema (JSON key struct, "
    "flattened value with delete-rewrite, trailing tombstones, "
    "per-partition monotonic offsets) and decoded by "
    "sources/kafka_shape.py:decode_kafka_records — the exact transform "
    "a broker-backed readStream feeds (id parsed from the key STRUCT, "
    "fixing reference latent bug B, consumer_to_opensearch.py:74) — "
    "then snapshotted; must equal the direct snapshot.  No broker can "
    "exist in this container (terraform/main.tf:47-92 provisions the "
    "real one); this row puts every line of the decode path the broker "
    "would feed under the oracle gate instead of pytest alone",
)
def cdc_kafka_wire_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.kafka_shape import decode_kafka_records

    wire = to_wire(unwrap(generate_envelope_log(spark, sf_dir)))
    kafka_shaped = wire.select(
        F.col("key_json").cast("binary").alias("key"),
        F.col("value_json").cast("binary").alias("value"),
        F.col("partition"),
        F.col("offset"),
    )
    decoded = decode_kafka_records(kafka_shaped)
    return latest_snapshot(decoded, key_cols=("id",), order_cols=("offset",)).drop(
        "offset"
    )


@register(
    "cdc_snapshot_at",
    oracle="""
SELECT
  CAST(c_custkey AS INTEGER) AS id,
  CASE WHEN c_custkey % 3 = 0
       THEN '+1-' || lpad(CAST(c_custkey * 104729 % 10000000 AS VARCHAR), 7, '0')
       ELSE '+1-' || lpad(CAST(c_custkey * 7919 % 10000000 AS VARCHAR), 7, '0')
  END AS phone,
  CASE WHEN c_custkey % 2 = 0 THEN 'public' ELSE 'private' END AS classification
FROM customer
WHERE NOT (c_custkey % 7 = 0
           AND c_custkey * 1000 + 900000 <= (SELECT max(c_custkey) FROM customer) * 1000 + 600000)
""",
    doc="J5: point-in-time snapshot (as-of T = base + max_id*1000 + 600000 ms): "
    "all inserts+updates applied, only early-enough deletes applied",
)
def cdc_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = unwrap(generate_envelope_log(spark, sf_dir))
    base_ms = 1_704_067_200_000
    thr = events.agg(
        (F.max(F.col("id")).cast("long") * 1000 + base_ms + 600_000).alias("__thr")
    )
    filtered = events.join(F.broadcast(thr)).filter(F.col("ts_ms") <= F.col("__thr"))
    return latest_snapshot(filtered.drop("__thr")).select(
        "id", "phone", "classification"
    )
