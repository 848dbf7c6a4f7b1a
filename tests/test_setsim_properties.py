"""Property-based set-similarity semantics: for arbitrary small corpora
(including repeated documents, shared boilerplate, and single-token
texts), jaccard_threshold_join and containment_join must equal the
brute-force all-pairs computation over the same shingle sets — the
pruning (size filters, posting-list count formulation) must be provably
lossless on inputs a generator searches adversarially, not just on the
fixtures we thought of."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


def _brute(sh: dict[int, frozenset], threshold: float, directional: bool):
    out = {}
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a == b or (not directional and a >= b):
                continue
            inter = len(sa & sb)
            score = (
                inter / len(sa)
                if directional
                else inter / len(sa | sb)
            )
            if score >= threshold:
                out[(a, b)] = round(score, 6)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy, threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_setsim_joins_equal_brute_force(spark, texts, threshold):
    from aiven_challenge2_cdc_sharing_spark.operators.dedup import (
        containment_join,
        jaccard_threshold_join,
        with_shingles,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    sh = {
        r["doc_id"]: frozenset(r["__sh"])
        for r in with_shingles(df, "text").collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_threshold_join(df, "doc_id", "text", threshold).collect()
    }
    assert jac == _brute(sh, threshold, directional=False)
    cont = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, "doc_id", "text", threshold).collect()
    }
    assert cont == _brute(sh, threshold, directional=True)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edges_strategy)
def test_connected_components_equals_union_find(spark, edges):
    """The iterative min-label + pointer-jump CC must equal a plain
    union-find on generator-searched graphs: chains, self-parallel
    edges, reversed duplicates, multiple components, stars — the
    shapes that probe convergence (the monotone-sum probe must not
    exit early) and label minimality."""
    from aiven_challenge2_cdc_sharing_spark.operators.clustering import (
        connected_components,
    )

    # brute force: union-find with path compression
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in parent}

    if not edges:
        return  # operator contract: labels exist only for nodes with edges
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == expect
