"""Hypothesis property tests for the round-4 interval/resample ops:
generator-searched event layouts vs brute-force references."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aiven_challenge2_cdc_sharing_spark.queries import load_registry

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)

# (user, minute) event layouts: few users, minutes across ~3h so
# sessions (30-min gap) merge and split in generator-chosen ways
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 180)),
    min_size=1,
    max_size=25,
)


def _sessions(rows):
    """Brute-force 30-min-gap sessionization -> [(start, end)] minutes."""
    by_user: dict[int, list[int]] = {}
    for uid, minute in rows:
        by_user.setdefault(uid, []).append(minute)
    out = []
    for minutes in by_user.values():
        minutes.sort()
        start = prev = minutes[0]
        for m in minutes[1:]:
            if (m - prev) * 60 > 1800:
                out.append((start, prev))
                start = m
            prev = m
        out.append((start, prev))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events_strategy)
def test_peak_concurrency_matches_bruteforce(spark, tmp_path_factory, layout):
    tmpdir = tmp_path_factory.mktemp("conc")
    rows = [
        (i, T0 + dt.timedelta(minutes=m), uid, "click", 1.0, "{}")
        for i, (uid, m) in enumerate(layout)
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        f"{tmpdir}/events.parquet"
    )
    got = (
        load_registry()["dash_peak_concurrency"]
        .fn(spark, str(tmpdir))
        .collect()[0]["peak_concurrency"]
    )
    # brute force: scan every second of the span, count sessions whose
    # INCLUSIVE [start, end] covers it
    sess = _sessions(layout)
    span = range(0, 181 * 60)
    expected = max(
        sum(1 for s, e in sess if s * 60 <= t <= e * 60) for t in span
    )
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(1, 50)),
        min_size=1,
        max_size=15,
    )
)
def test_resample_linear_matches_reference(spark, tmp_path_factory, layout):
    # (user, bucket-index, value): events pinned to 6h-bucket starts so
    # the reference interpolation is exact integer bucket arithmetic
    tmpdir = tmp_path_factory.mktemp("lin")
    rows = [
        (i, T0 + dt.timedelta(hours=6 * b), uid, "click", float(v), "{}")
        for i, (uid, b, v) in enumerate(layout)
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        f"{tmpdir}/events.parquet"
    )
    out = load_registry()["ts_resample_linear"].fn(spark, str(tmpdir)).collect()

    # reference: per user, per bucket, linear interp between nearest
    # observed bucket sums
    sums: dict[tuple[int, int], float] = {}
    for uid, b, v in layout:
        sums[(uid, b)] = sums.get((uid, b), 0.0) + float(v)
    buckets = sorted({b for _, b, _ in layout})
    lo, hi = buckets[0], buckets[-1]
    users = {uid for uid, _, _ in layout}

    def ref(uid, b):
        if (uid, b) in sums:
            return sums[(uid, b)]
        obs = sorted(bb for (u, bb) in sums if u == uid)
        prev = max((x for x in obs if x < b), default=None)
        nxt = min((x for x in obs if x > b), default=None)
        if prev is None or nxt is None:
            return None
        pv, nv = sums[(uid, prev)], sums[(uid, nxt)]
        return pv + (nv - pv) * (b - prev) / (nxt - prev)

    got = {
        (r["user_id"], r["bucket"]): r["interp_sum"] for r in out
    }
    assert len(got) == len(users) * (hi - lo + 1)
    for uid in users:
        for b in range(lo, hi + 1):
            key = (uid, T0 + dt.timedelta(hours=6 * b))
            expected = ref(uid, b)
            if expected is None:
                assert got[key] is None, (uid, b)
            else:
                assert got[key] is not None and abs(
                    got[key] - round(expected, 4)
                ) < 1e-6, (uid, b, got[key], expected)
