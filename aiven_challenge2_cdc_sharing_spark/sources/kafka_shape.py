"""Kafka-source parity (SURVEY.md §2.1 S1/S2, §2.9 T1/T8).

No broker exists in the test container, so the contract is split:
- ``kafka_stream_reader`` builds the real ``readStream.format("kafka")``
  plan (isolation level, starting offsets) — compiled, documented,
  unexecutable here;
- ``decode_kafka_records`` is the pure transform from Kafka's wire
  schema (key/value binary, topic/partition/offset/timestamp) to the
  engine's flattened CDC rows.  It is batch/stream agnostic and fully
  tested by round-tripping ``to_wire`` output through binary columns —
  so swapping the file source for a broker touches zero query logic.

Key extraction parses the key JSON struct (never ``int(raw_bytes)``),
fixing the reference's latent bug B (consumer_to_opensearch.py:74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CDC_WIRE_KEY, CDC_WIRE_VALUE


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "cdc-pg.public.customer",
    starting_offsets: str = "earliest",
):
    """The production source (reference topic name per
    terraform/main.tf:248 prefix + table).  Returns the configured
    reader; caller ``.load()``s it where a broker exists."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        # T8 — read_committed, mirroring terraform/main.tf:133
        .option("kafka.isolation.level", "read_committed")
        .option("failOnDataLoss", "false")
    )


def decode_kafka_records(records: DataFrame) -> DataFrame:
    """Kafka wire schema -> flattened CDC change rows.

    Input columns (the Kafka source contract): ``key: binary``,
    ``value: binary`` (null = tombstone), ``partition: int``,
    ``offset: long``.  Output matches ``cdc.algebra.from_wire``:
    payload columns + ``__deleted`` + ``offset`` for ordering.
    """
    parsed = records.select(
        F.from_json(F.col("key").cast("string"), CDC_WIRE_KEY).alias("k"),
        F.from_json(F.col("value").cast("string"), CDC_WIRE_VALUE).alias("v"),
        F.col("value").isNull().alias("is_tombstone"),
        F.col("offset"),
    )
    return parsed.select(
        F.col("k.id").alias("id"),
        F.col("v.full_name").alias("full_name"),
        F.col("v.email").alias("email"),
        F.col("v.phone").alias("phone"),
        F.col("v.classification").alias("classification"),
        F.col("v.created_at").alias("created_at"),
        (
            F.col("is_tombstone")
            | F.coalesce(F.col("v.__deleted") == "true", F.lit(False))
        ).alias("__deleted"),
        F.col("offset"),
    )
