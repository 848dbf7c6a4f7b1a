"""Engine-level tests for the round-4 operators: semantics the oracle
hash can't see (invariants, adversarial inputs, completeness proofs)."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from pyspark.sql import functions as F

from aiven_challenge2_cdc_sharing_spark.queries import load_registry


def _q(name):
    return load_registry()[name].fn


def test_cep_hand_crafted_sequences(spark, tmpdir):
    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, mins):
        return (eid, t0 + dt.timedelta(minutes=mins), uid, typ, 1.0, "{}")

    rows = [
        # u1: view -> purchase @ +30min, clean -> converted, 1800s
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 30),
        # u2: view -> error @ +10 -> purchase @ +30 -> blocked
        ev(3, 2, "view", 0), ev(4, 2, "error", 10), ev(5, 2, "purchase", 30),
        # u3: view -> purchase @ +90min (outside window) -> not converted
        ev(6, 3, "view", 0), ev(7, 3, "purchase", 90),
        # u4: purchase BEFORE first view must not count; second purchase in
        # window converts
        ev(8, 4, "purchase", -5), ev(9, 4, "view", 0), ev(10, 4, "purchase", 20),
        # u5: view only -> not converted
        ev(11, 5, "view", 0),
        # u6: error AFTER the purchase must not block
        ev(12, 6, "view", 0), ev(13, 6, "purchase", 15), ev(14, 6, "error", 20),
        # u7: no view at all -> excluded from output
        ev(15, 7, "purchase", 0),
        # u8: purchase at exactly +60min is inside the closed window
        ev(16, 8, "view", 0), ev(17, 8, "purchase", 60),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    path = f"{tmpdir}/events.parquet"
    df.write.mode("overwrite").parquet(path)
    out = {
        r["user_id"]: (r["converted"], r["secs_to_purchase"])
        for r in _q("cep_purchase_within_hour")(spark, str(tmpdir)).collect()
    }
    assert out == {
        1: (True, 1800),
        2: (False, None),
        3: (False, None),
        4: (True, 1200),
        5: (False, None),
        6: (True, 900),
        8: (True, 3600),
    }


def test_count_min_never_underestimates_and_exact_when_wide(spark, sf_dir):
    rows = _q("agg_count_min_probe")(spark, sf_dir).collect()
    assert rows, "probe output empty"
    for r in rows:
        assert r["cm_estimate"] >= r["exact_cnt"], r
        assert r["never_underestimates"] is True
    # with width 32 and ~30 tokens, at least SOME estimate must exceed
    # its exact count (otherwise the test scale isn't exercising
    # collisions and the operator proves nothing beyond groupBy)
    assert any(r["cm_estimate"] > r["exact_cnt"] for r in rows)


def test_equidepth_bins_balanced(spark, sf_dir):
    rows = _q("agg_equidepth_histogram")(spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(1, 9))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile balance guarantee
    # bins tile the value range in order (lo/hi may touch on duplicate
    # boundary values but never invert)
    for a, b in itertools.pairwise(rows):
        assert a["hi"] <= b["lo"]


def test_symspell_candidates_complete_vs_bruteforce(spark, tmpdir):
    # random 4-6 letter words over a 4-letter alphabet: dense in edit
    # space, so distance<=2 pairs abound; brute force is the truth
    rng = random.Random(42)
    words = {
        "".join(rng.choice("abcd") for _ in range(rng.randint(4, 6)))
        for _ in range(60)
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    expected = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= 2
    }
    docs = spark.createDataFrame(
        [(i, w, "en", "s", len(w)) for i, w in enumerate(sorted(words))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmpdir}/documents.parquet")
    got = {
        (r["w1"], r["w2"], r["dist"])
        for r in _q("dedup_edit_distance_pairs")(spark, str(tmpdir)).collect()
    }
    assert got == expected
    assert len(expected) > 10  # the corpus actually exercises the join


def test_pagerank_suppliers_dominate(spark, sf_dir):
    from aiven_challenge2_cdc_sharing_spark.tables import load_table

    rows = _q("graph_pagerank_suppliers")(spark, sf_dir).collect()
    assert len(rows) == 20
    # suppliers aggregate many customers' mass, so they must fill the
    # head of the ranking: the first min(20, |suppliers|) rows are all
    # suppliers (sf0.001 has only 10 suppliers; larger sfs have 100+)
    n_sup = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_suppkey")
        .distinct()
        .count()
    )
    head = rows[: min(20, n_sup)]
    assert all(r["node"].startswith("s") for r in head)
    # rank column is sorted desc; bidirected graph with no dangling
    # nodes conserves mass, so the top-20 total stays under 1 and
    # every rank is positive
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert 0 < sum(ranks) < 1
    assert all(r > 0 for r in ranks)


def test_peak_concurrency_synthetic_overlaps(spark, tmpdir):
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1, 12, 0, 0)

    def ev(eid, uid, mins):
        return (eid, t0 + dt.timedelta(minutes=mins), uid, "click", 1.0, "{}")

    # u1: one session [0, 10]; u2: [5, 20]; u3: [8, 9]; u4: [60, 61]
    # (a new session, outside the others) -> peak 3 during [8, 9]
    rows = [
        ev(1, 1, 0), ev(2, 1, 10),
        ev(3, 2, 5), ev(4, 2, 20),
        ev(5, 3, 8), ev(6, 3, 9),
        ev(7, 4, 60), ev(8, 4, 61),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    r = _q("dash_peak_concurrency")(spark, str(tmpdir)).collect()[0]
    assert r["peak_concurrency"] == 3
    # inclusive ends: a session ending exactly when another starts
    # still overlaps for that second (the -1 lands one second later)
    rows2 = [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 10), ev(4, 2, 20)]
    spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{tmpdir}/events.parquet")
    r2 = _q("dash_peak_concurrency")(spark, str(tmpdir)).collect()[0]
    assert r2["peak_concurrency"] == 2
