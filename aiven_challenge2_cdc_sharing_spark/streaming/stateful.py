"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9/T5 extension): arbitrary per-key state the built-in
aggregations can't express.

Example operator: per-user running profile (event count + value sum +
last event time), updated per micro-batch and emitted incrementally —
the shape a feature-store / CDC-enrichment pipeline needs.  State is
per key (small, bounded by key cardinality), checkpointed with the
query, partitioned by the grouping key across executors."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Streaming: cumulative per-user profile emitted each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# The same operator on the Spark 4.x transformWithStateInPandas API
# (SPARK-49101 "State API v2"): an object-style StatefulProcessor with
# named, schema'd state variables instead of a single opaque tuple —
# the composable replacement for applyInPandasWithState above.  Both
# implementations stay side by side deliberately: identical semantics,
# two API generations, one parity test.
# ---------------------------------------------------------------------------

try:  # pragma: no cover - import guard exercised by CI environments
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # the state-v2 wire protocol is protobuf-based; PySpark only imports
    # it lazily inside the streaming worker, so probe here to fail fast
    # with a clear message instead of a mid-query worker crash
    import google.protobuf  # noqa: F401

    _HAS_TWS = True
except ImportError:  # Spark < 4.0, or protobuf not installed
    StatefulProcessor = object  # type: ignore[assignment,misc]
    _HAS_TWS = False


class RunningProfileProcessor(StatefulProcessor):
    """Per-user running (count, value-sum) profile with ValueState."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._profile = handle.getValueState("profile", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        if self._profile.exists():
            n, total = self._profile.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._profile.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles_v2(events: DataFrame) -> DataFrame:
    """Streaming: cumulative per-user profile via the state-v2 API."""
    if not _HAS_TWS:  # pragma: no cover
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 and the "
            "protobuf package (its state-server wire protocol)"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
