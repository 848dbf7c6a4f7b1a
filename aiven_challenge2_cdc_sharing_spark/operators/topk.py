"""Top-k operators (SURVEY.md §2.6).

``top_k`` relies on Spark's TakeOrderedAndProject (per-partition heaps +
driver merge — no global sort, no full shuffle).  ``top_k_per_group`` is
the window formulation; Spark pushes a per-partition rank limit below
the shuffle (WindowGroupLimit) so only k rows per group per partition
shuffle."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
