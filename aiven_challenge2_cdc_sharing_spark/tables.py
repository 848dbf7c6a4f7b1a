"""Parquet loaders for the driver test tables.

Reads are plain ``spark.read.parquet`` — self-describing, vectorized,
column-pruned and filter-pushed by Catalyst.  At 100 TB these would be
partitioned/bucketed Delta tables; the loader is the single seam where
that swap happens.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import TABLE_NAMES, TESTDATA_COLUMNS

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_COLUMNS:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # Some generator versions store ts as TIMESTAMP(NANOS), which the
        # vectorized Spark reader rejects; with nanosAsLong those files read
        # the raw int64 nanos, truncated here to micros (same truncation
        # DuckDB applies). TIMESTAMP(MICROS) files read natively as a
        # timestamp column and need no conversion — check the read dtype.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Streaming watermarks require TIMESTAMP (LTZ); under the UTC
            # session timezone this cast is value-identical to the NTZ read
            # and to what timestamp_micros produced for the nanos files.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for spark.sql paths)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
