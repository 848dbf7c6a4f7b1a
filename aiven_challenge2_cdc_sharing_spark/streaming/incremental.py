"""Incremental materialized-view maintenance from CDC change streams.

The reference serves "Count by Classification" from an index that is
rebuilt per query (README.md:150-152).  Here the aggregate itself is
maintained incrementally from the change stream: each envelope
contributes deltas derived from its before/after images —

- insert:  +1 for after.classification
- delete:  -1 for before.classification
- update:  -1 for before.classification, +1 for after.classification
           (a no-op pair when the group key didn't change)

so a micro-batch of B events touches O(groups) state rows, independent
of table size — the classic incremental view maintenance (IVM) result,
and the one place the Debezium *before image* is load-bearing
(consumer_to_opensearch.py:79-81 models it but never uses it).

Exactly-once: delta-aggregation is NOT idempotent by value (unlike the
last-writer-wins snapshot), so at-least-once delivery needs explicit
event dedup that SURVIVES batch boundaries — a redelivered event can
arrive in a later micro-batch than its original (the engine's own test
generator does this on purpose).  The maintainer therefore keeps a
processed-(ts_ms, seq) log next to the counts and anti-joins each batch
against it before computing deltas.  At scale the processed log is
bounded by watermark retention (events older than the source's replay
window can be compacted away); full crash-atomicity between the two
writes needs a transactional table format (Delta) — noted, not faked,
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def classification_deltas(envelopes: DataFrame) -> DataFrame:
    """Envelope batch -> (classification, delta) contributions."""
    deduped = envelopes.dropDuplicates(["ts_ms", "seq"])
    plus = deduped.filter(F.col("op").isin("c", "u")).select(
        F.col("after.classification").alias("classification"),
        F.lit(1).alias("delta"),
    )
    minus = deduped.filter(F.col("op").isin("u", "d")).select(
        F.col("before.classification").alias("classification"),
        F.lit(-1).alias("delta"),
    )
    return (
        plus.unionByName(minus)
        .groupBy("classification")
        .agg(F.sum("delta").alias("delta"))
    )


def apply_agg_deltas(counts: DataFrame, deltas: DataFrame) -> DataFrame:
    """Merge delta rows into a (classification, cnt) state table,
    dropping groups that reach zero."""
    merged = (
        counts.select("classification", F.col("cnt").alias("delta"))
        .unionByName(deltas)
        .groupBy("classification")
        .agg(F.sum("delta").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )
    return merged


def run_incremental_counts(
    envelopes: DataFrame, state_path: str, checkpoint_path: str
):
    """Maintain the count-by-classification aggregate incrementally
    from an envelope stream (availableNow)."""
    import os

    spark = envelopes.sparkSession
    counts_path = os.path.join(state_path, "counts")
    processed_path = os.path.join(state_path, "processed")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        fresh = batch_df.dropDuplicates(["ts_ms", "seq"])
        if os.path.exists(processed_path):
            seen = spark.read.parquet(processed_path)
            fresh = fresh.join(seen, ["ts_ms", "seq"], "left_anti")
        fresh = fresh.localCheckpoint(eager=True)  # pin before state writes
        deltas = classification_deltas(fresh)
        if os.path.exists(counts_path):
            state = apply_agg_deltas(spark.read.parquet(counts_path), deltas)
        else:
            state = deltas.select(
                "classification", F.col("delta").alias("cnt")
            ).filter(F.col("cnt") != 0)
        state.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            counts_path
        )
        fresh.select("ts_ms", "seq").write.mode("append").parquet(processed_path)

    return (
        envelopes.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
