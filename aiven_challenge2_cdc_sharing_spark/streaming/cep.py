"""Streaming CEP: the per-user pattern state machine behind
``cep_purchase_within_hour`` (view -> [^error]* -> purchase within 1h)
as a custom stateful operator.

The batch query computes the pattern over the full history; this twin
carries exactly the state the pattern needs per user — four scalars:

- ``v_ts``    first 'view' seen (the match anchor),
- ``p_ts``    first qualifying 'purchase' after it (match close),
- ``err_us``  first 'error' after the anchor (its timestamp, so the
  batch query's STRICT err < purchase comparison survives ts ties),
- nothing else: no event buffer, no window scan.

Correctness contract: EXACT batch parity under per-key in-order
delivery, which is precisely the guarantee the reference's transport
provides (single-partition topic + one consumer task,
terraform/main.tf:79,234 — and in Spark, a Kafka source keyed by user
preserves per-key order within a partition).  Under arbitrary
cross-batch reordering a bounded-state machine cannot be exact (an
earlier-timestamped view arriving late can re-anchor the match and
would require re-examining already-discarded purchases); the general
fix is watermark-delayed finalization — buffer the window's events in
state until the watermark passes ``v_ts + 1h``, emit once, clear —
traded off here for O(1) state and per-batch incremental emission,
the same trade ``running_user_profiles`` makes.

Within a micro-batch the rows of one user arrive as one pandas group
and are sorted by (ts, event_id) before folding, so intra-batch file
order doesn't matter — only cross-batch order is assumed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CEP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("converted", T.BooleanType()),
        T.StructField("secs_to_purchase", T.LongType()),
    ]
)

# (v_ts_us, p_ts_us, err_ts_us) — timestamps as epoch micros so the
# state row is three fixed-width scalars; -1 = unset
CEP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("v_us", T.LongType()),
        T.StructField("p_us", T.LongType()),
        T.StructField("err_us", T.LongType()),
    ]
)

_HOUR_US = 3_600_000_000


def _fold_events(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    v_us, p_us, err_us = state.get if state.exists else (-1, -1, -1)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    for ts, typ in zip(
        rows["ts"].astype("int64"), rows["event_type"], strict=True
    ):
        # pandas datetime64[ns] -> ns; state keeps micros
        ts_us = ts // 1_000
        if v_us < 0:
            if typ == "view":
                v_us = ts_us
            continue
        if p_us >= 0 or ts_us <= v_us:
            continue  # pattern closed, or event not after the anchor
        if typ == "error":
            if err_us < 0:
                err_us = ts_us
        elif typ == "purchase" and ts_us <= v_us + _HOUR_US:
            p_us = ts_us
    state.update((v_us, p_us, err_us))
    if v_us < 0:
        return  # no anchor yet: user has no row in the batch output
    # strict err < p, matching the batch query's BETWEEN exclusivity
    converted = p_us >= 0 and not (0 <= err_us < p_us)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "converted": [converted],
            # per-timestamp second truncation (p//1s - v//1s), NOT the
            # floor of the microsecond delta: the batch twin computes
            # unix_timestamp(p) - unix_timestamp(v), each truncated to
            # whole seconds first, and the two differ by 1s whenever
            # frac(p) < frac(v).
            "secs_to_purchase": [
                p_us // 1_000_000 - v_us // 1_000_000 if converted else None
            ],
        }
    )


def streaming_purchase_conversion(events: DataFrame) -> DataFrame:
    """Streaming: per-user conversion verdict, updated per micro-batch.

    The last emission per user equals the batch
    ``cep_purchase_within_hour`` row under in-order delivery
    (parity-pinned in tests/test_streaming_cep.py).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_events,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------- regex-journey streaming twin

JOURNEY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("browse_buy", T.LongType()),
        T.StructField("error_loops", T.LongType()),
        T.StructField("ever_converted", T.BooleanType()),
    ]
)

# the whole symbolized journey: ONE string per user, one char per
# event — bounded by events-per-user (kilobytes at 100 TB because the
# alphabet is event TYPES; a hot user would be windowed first, the
# batch twin's documented cap discipline)
JOURNEY_STATE_SCHEMA = T.StructType(
    [T.StructField("s", T.StringType())]
)

_SYM = {"view": "v", "click": "c", "purchase": "p", "error": "e"}


def _fold_journey(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: GroupState
) -> "Iterator[pd.DataFrame]":
    import re as _re

    (s,) = state.get if state.exists else ("",)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    s += "".join(_SYM.get(t, "s") for t in rows["event_type"])
    state.update((s,))
    # leftmost non-overlapping count — Python re.findall and the batch
    # twin's Java regexp_extract_all agree for these star-height-1
    # patterns (parity-pinned in tests/test_streaming_cep.py)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [len(s)],
            "browse_buy": [len(_re.findall("vc*p", s))],
            "error_loops": [len(_re.findall("ec*e", s))],
            "ever_converted": [bool(_re.search("v.*p", s))],
        }
    )


def streaming_journey_patterns(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``cep_regex_journey_patterns``:
    per-user symbol-buffer state (the journey string itself), regex
    pattern counts re-emitted per micro-batch.

    Same delivery contract as ``streaming_purchase_conversion``:
    exact batch parity under per-key in-order delivery.  Unlike the
    purchase machine this one keeps the full symbol string — that IS
    the minimal sufficient state for arbitrary regex patterns (a DFA
    per fixed pattern could drop it, but then the pattern set would
    be frozen into the state schema; the string keeps the operator
    pattern-agnostic, the same trade the batch twin makes)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _fold_journey,
        outputStructType=JOURNEY_OUTPUT_SCHEMA,
        stateStructType=JOURNEY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
