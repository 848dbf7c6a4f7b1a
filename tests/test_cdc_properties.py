"""Property-based CDC semantics: for arbitrary op sequences (with
duplicates and shuffled arrival), the engine's window-based
materializer must equal a sequential replay of the log in event-time
order — the formal version of the reference's eyeball oracle
(SURVEY.md §5), seeded like producer_insert.py's workload."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from aiven_challenge2_cdc_sharing_spark.cdc import latest_snapshot, unwrap
from aiven_challenge2_cdc_sharing_spark.schemas import CDC_ENVELOPE

KEYS = list(range(1, 13))


def _row(key: int, op: str, ts_ms: int, seq: int, phone: str):
    img = {
        "id": key,
        "full_name": f"Customer#{key:09d}",
        "email": f"c{key}@example.com",
        "phone": phone,
        "classification": "public" if key % 2 == 0 else "private",
        "created_at": dt.datetime(2024, 1, 1) + dt.timedelta(seconds=key),
    }
    return {
        "op": op,
        "before": img if op == "d" else (img if op == "u" else None),
        "after": None if op == "d" else img,
        "ts_ms": ts_ms,
        "source_table": "customer",
        "seq": seq,
    }


ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["c", "u", "d"]),
        st.integers(min_value=0, max_value=5),  # coarse ts -> forces seq ties-break
    ),
    min_size=1,
    max_size=40,
)


def _model_replay(events: list[dict]) -> dict[int, str]:
    """Sequential replay in (ts_ms, seq) order — the reference's
    single-consumer apply loop, made deterministic."""
    state: dict[int, str] = {}
    for e in sorted(events, key=lambda e: (e["ts_ms"], e["seq"])):
        key = (e["after"] or e["before"])["id"]
        if e["op"] == "d":
            state.pop(key, None)
        else:
            state[key] = (e["after"])["phone"]
    return state


@given(ops=ops_strategy, shuffle_seed=st.integers(0, 1000))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_equals_sequential_replay(spark, ops, shuffle_seed):
    events = [
        _row(key, op, ts_ms=1_000 + ts, seq=i, phone=f"+1-{i:07d}")
        for i, (key, op, ts) in enumerate(ops)
    ]
    # duplicate a prefix (at-least-once replay) and shuffle arrival order
    events = events + events[: len(events) // 3]
    import random

    random.Random(shuffle_seed).shuffle(events)

    df = spark.createDataFrame(events, CDC_ENVELOPE)
    snap = latest_snapshot(unwrap(df))
    got = {r["id"]: r["phone"] for r in snap.collect()}
    assert got == _model_replay(events)
