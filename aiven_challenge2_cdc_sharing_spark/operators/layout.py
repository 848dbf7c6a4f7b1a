"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional row-group skipping.

A linear sort optimizes min/max pruning for ONE column; interleaving
the bits of two (or more) key columns orders data along a space-filling
curve so parquet row-group statistics stay narrow on EVERY interleaved
dimension.  This is the open-format version of Delta OPTIMIZE ZORDER —
pure Spark: rank each column to a bounded integer (percent_rank
bucketing), interleave bits with JVM expressions, sort by the key.

At 100 TB: run at write time (`save_governed_copy(sort_within...)` with
a zorder key) so point/range filters on either dimension skip most
row groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension (2 dims -> 32-bit Morton key)


def _bucket_rank(col: Column, w) -> Column:
    """Map a column to [0, 2^ZBITS) by its percent_rank (distribution-
    robust: works for skewed values, floats, any orderable type)."""
    return F.least(
        F.floor(F.percent_rank().over(w) * (1 << ZBITS)).cast("long"),
        F.lit((1 << ZBITS) - 1).cast("long"),
    )


def _interleave(a: Column, b: Column) -> Column:
    """Morton-interleave two ZBITS-bit integers (a gets even bits)."""
    key = F.lit(0).cast("long")
    for i in range(ZBITS):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def zorder_key(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Append ``__zkey``: the Morton code of the two columns' rank
    buckets.  NOTE: uses two global percent_rank windows — at real
    scale replace with approx-quantile bucketing (computed once on a
    sample) to avoid the single-partition window; the key semantics
    are identical."""
    from pyspark.sql import Window

    wa = Window.orderBy(col_a)
    wb = Window.orderBy(col_b)
    return df.withColumn(
        "__zkey",
        _interleave(_bucket_rank(F.col(col_a), wa), _bucket_rank(F.col(col_b), wb)),
    )


def zorder_write(
    df: DataFrame, location: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Write ``df`` Z-ordered on (col_a, col_b): range-partition by the
    Morton key so each output file covers a compact region of the
    2-D key space, keeping BOTH columns' min/max stats narrow."""
    keyed = zorder_key(df, col_a, col_b)
    keyed.repartitionByRange(n_files, "__zkey").sortWithinPartitions(
        "__zkey"
    ).drop("__zkey").write.mode("overwrite").parquet(location)
