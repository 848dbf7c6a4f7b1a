"""Property-based semantic-dedup semantics: for arbitrary small vector
sets (including duplicates, near-duplicates, and degenerate zero-ish
vectors avoided by construction), the clustered pair enumeration must
be SOUND — every emitted pair is a true >=threshold pair with the
exact brute-force cosine — and with a single cluster it must be
COMPLETE (identical to brute force), because one cluster disables the
partitioning and only the scoring path remains."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
    semantic_dedup_pairs,
)

# small integer-grid vectors: cosines are exactly reproducible in
# float and the generator still finds duplicates / opposites / near-dups
vec_strategy = st.lists(
    st.lists(st.integers(min_value=-3, max_value=3), min_size=4, max_size=4)
    .map(lambda v: [float(x) for x in v])
    .filter(lambda v: any(x != 0 for x in v)),
    min_size=2,
    max_size=10,
)


def _brute(vecs: list[list[float]], threshold: float) -> dict:
    out = {}
    for a in range(len(vecs)):
        for b in range(a + 1, len(vecs)):
            va, vb = vecs[a], vecs[b]
            dot = sum(x * y for x, y in zip(va, vb))
            na = math.sqrt(sum(x * x for x in va))
            nb = math.sqrt(sum(x * x for x in vb))
            sim = round(dot / (na * nb), 6)
            if sim >= threshold:
                out[(a, b)] = sim
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(vecs=vec_strategy, threshold=st.sampled_from([0.0, 0.5, 0.9]))
def test_single_cluster_equals_brute_force(spark, vecs, threshold):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    got = {
        (r.id_a, r.id_b): r.sim
        for r in semantic_dedup_pairs(
            df, threshold=threshold, n_clusters=1, iters=1
        ).collect()
    }
    assert got == _brute(vecs, threshold)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(vecs=vec_strategy)
def test_clustered_pairs_are_sound(spark, vecs):
    # with k > 1 the partition may MISS cross-cluster pairs (that is
    # the SemDeDup trade), but every pair it emits must be a true
    # >=threshold pair with the exact cosine
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    brute = _brute(vecs, 0.5)
    got = {
        (r.id_a, r.id_b): r.sim
        for r in semantic_dedup_pairs(
            df, threshold=0.5, n_clusters=2, iters=2
        ).collect()
    }
    for pair, sim in got.items():
        assert pair in brute
        assert sim == brute[pair]
