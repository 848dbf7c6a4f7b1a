"""Streaming sessionizer: the stateful half of the peak-concurrency
sweep (``dash_peak_concurrency`` / ``_scalable``).

The batch twins sessionize the full history (30-minute gap rule) and
sweep start/end deltas; this operator maintains ONE open session per
user in state and emits

- a ``closed=True`` row the moment a gap closes a session (final —
  never re-emitted), and
- a ``closed=False`` row per batch for the still-open session
  (emit-latest semantics: a later batch may extend or close it).

Downstream, "current sessions" = all closed rows + the latest open
row per user; feeding those into the batch sweep reproduces the batch
peak exactly (pinned in tests/test_streaming_sessions.py across 3
micro-batches).  State is two scalars (open-session start/end in
epoch micros) — O(1) per user, the same trade the CEP machine makes:
exact under per-key in-order delivery, which is the transport's
guarantee (reference: single-partition topic + one consumer task,
terraform/main.tf:79,234).

The gap rule compares SECOND-truncated timestamps (``unix_timestamp``
semantics), matching the batch twins' ``epoch()`` arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("s_sec", T.LongType()),
        T.StructField("e_sec", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

# open session (start, end) in epoch micros; -1 = no open session
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s_us", T.LongType()),
        T.StructField("e_us", T.LongType()),
    ]
)

GAP_SECONDS = 1800


def _fold_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    s_us, e_us = state.get if state.exists else (-1, -1)
    rows = pd.concat(list(pdfs), ignore_index=True)
    # a null/NaT ts would become INT64_MIN under astype("int64"), sort
    # first, and silently close the open session with a negative-epoch
    # row — drop such rows instead (ADVICE r6)
    rows = rows.dropna(subset=["ts"])
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    out: list[tuple[int, int, int, bool]] = []
    uid = key[0]
    for ts in rows["ts"].astype("int64"):
        ts_us = ts // 1_000  # pandas ns -> micros
        if s_us < 0:
            s_us = e_us = ts_us
        elif ts_us // 1_000_000 - e_us // 1_000_000 > GAP_SECONDS:
            out.append(
                (uid, s_us // 1_000_000, e_us // 1_000_000, True)
            )
            s_us = e_us = ts_us
        elif ts_us > e_us:
            e_us = ts_us
    state.update((s_us, e_us))
    if s_us >= 0:
        out.append((uid, s_us // 1_000_000, e_us // 1_000_000, False))
    if out:
        yield pd.DataFrame(
            out, columns=["user_id", "s_sec", "e_sec", "closed"]
        )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """Per-user gap sessionizer over a stream; see module docstring."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_sessions,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- coverage

COVERAGE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("covered_s", T.LongType()),
        T.StructField("max_end_s", T.LongType()),
    ]
)

# running interval-union state: furthest covered end + accumulated
# union length, both in epoch seconds
COVERAGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_end_s", T.LongType()),
        T.StructField("covered_s", T.LongType()),
    ]
)

IVL_SECONDS = 1800


def _fold_coverage(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming twin of ``win_interval_union_coverage``'s per-user
    union sweep: each event opens [ts, ts+1800) and the state folds
    the union length incrementally — contribution = interval end
    minus max(own start, furthest end so far), clamped at zero; the
    same O(1)-per-key trade as the gap sessionizer, exact under the
    transport's per-key in-order delivery.  Emits the latest
    (covered_s, max_end_s) per user per batch (emit-latest
    semantics); parity with the batch sweep is pinned in
    tests/test_streaming_sessions.py."""
    max_end, covered = state.get if state.exists else (-1, 0)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.dropna(subset=["ts"])
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    uid = key[0]
    for ts in rows["ts"].astype("int64"):
        s_sec = ts // 1_000_000_000  # pandas ns -> SECOND truncation
        e_sec = s_sec + IVL_SECONDS
        start = s_sec if s_sec > max_end else max_end
        if e_sec > start:
            covered += e_sec - start
        if e_sec > max_end:
            max_end = e_sec
    state.update((max_end, covered))
    yield pd.DataFrame(
        [(uid, covered, max_end)],
        columns=["user_id", "covered_s", "max_end_s"],
    )


def streaming_interval_coverage(events: DataFrame) -> DataFrame:
    """Per-user streaming interval-union coverage; see _fold_coverage."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_coverage,
        outputStructType=COVERAGE_OUTPUT_SCHEMA,
        stateStructType=COVERAGE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------- heavy hitters

HH_CAPACITY = 64

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("item", T.LongType()),
        T.StructField("est_count", T.LongType()),
        T.StructField("max_overcount", T.LongType()),
    ]
)

# space-saving summary: parallel arrays of (item, count, overcount),
# fixed capacity — O(1) state per shard regardless of stream size
HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("overs", T.ArrayType(T.LongType())),
    ]
)


def _fold_heavy_hitters(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Metwally space-saving over a keyed shard of the stream: at most
    HH_CAPACITY counters; a new item evicts the current minimum and
    inherits its count as overcount, giving the classic guarantees
    est >= true and est - overcount <= true (pinned against the exact
    batch counts in tests/test_streaming_sessions.py).  Emit-latest
    summary per batch."""
    if state.exists:
        items, counts, overs = state.get
        table = {
            it: [c, o] for it, c, o in zip(items, counts, overs)
        }
    else:
        table = {}
    shard = key[0]
    rows = pd.concat(list(pdfs), ignore_index=True)
    for it in rows["user_id"].astype("int64"):
        it = int(it)
        if it in table:
            table[it][0] += 1
        elif len(table) < HH_CAPACITY:
            table[it] = [1, 0]
        else:
            # evict the minimum (deterministic tie-break: smallest item)
            m_it = min(table, key=lambda k: (table[k][0], k))
            m_c = table[m_it][0]
            del table[m_it]
            table[it] = [m_c + 1, m_c]
    items = sorted(table)
    state.update(
        (
            items,
            [table[i][0] for i in items],
            [table[i][1] for i in items],
        )
    )
    yield pd.DataFrame(
        [(shard, i, table[i][0], table[i][1]) for i in items],
        columns=["shard", "item", "est_count", "max_overcount"],
    )


def streaming_heavy_hitters(events: DataFrame) -> DataFrame:
    """Sharded space-saving heavy hitters over a stream: shard by a
    hash of the key so state parallelizes, merge shard summaries
    downstream (counts are per-shard exact-ish; a key hashes to ONE
    shard, so cross-shard merging is concatenation, not addition)."""
    shard = (F.crc32(F.col("user_id").cast("string")) % 8).cast("int")
    return (
        events.withColumn("shard", shard)
        .groupBy("shard")
        .applyInPandasWithState(
            _fold_heavy_hitters,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
