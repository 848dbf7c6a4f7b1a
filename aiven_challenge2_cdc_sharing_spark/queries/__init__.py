"""Oracle-checked query registry (the driver contract).

Every operator claimed in SURVEY.md §2 registers here as a named query:
a (spark, sf_dir) -> DataFrame callable plus, where SQL-expressible, an
ANSI-SQL twin DuckDB runs over the same parquet.  ``__spark_entry__.py``
exposes this registry verbatim.

Conventions that make the cross-engine value-hash match:
- every computed/aggregate column is aliased identically on both sides;
- double aggregates are rounded (2-6 dp) on both sides so summation
  order can't flip the last bit;
- LIMIT/top-k queries carry a total tiebreak order;
- session timezone is UTC and timestamps stay second/micro-precision
  native values on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(fn, oracle, doc)
        return fn

    return deco


def load_registry() -> dict[str, Query]:
    # import for side effect: submodules register their queries
    from . import (  # noqa: F401
        aggregates,
        analytics,
        cdc_queries,
        coverage_extras,
        coverage_round2,
        coverage_round3,
        coverage_round4,
        coverage_round5,
        coverage_round6,
        coverage_round7,
        coverage_round8,
        coverage_round9,
        coverage_round10,
        coverage_round11,
        coverage_round12,
        coverage_round13,
        coverage_round14,
        coverage_round15,
        dashboards,
        extras2,
        ingest,
        joins,
        llm_ops,
        ml_pipeline,
        pipeline_extras,
        retrieval,
        scalars,
        setops,
        temporal,
        tpch_full,
        tpch_like,
        udf_ops,
        windows,
    )

    return REGISTRY
