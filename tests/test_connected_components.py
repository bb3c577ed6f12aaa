"""connected_components: cluster semantics the pair queries can't express."""

from __future__ import annotations

import pytest

from schwab_elt_etl_pipeline_spark.operators.dedup import connected_components


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "a_id long, b_id long")
    rows = connected_components(edges).collect()
    return {r.node: r.comp for r in rows}


def test_transitive_chain_collapses(spark):
    # A~B, B~C, C~D: one component labeled by the min id, even though
    # (A,D) was never a pair.
    got = _cc(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_apart(spark):
    got = _cc(spark, [(10, 11), (20, 21), (21, 22)])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_long_path_converges_via_pointer_jumping(spark):
    # Path of 40 nodes: diameter 39 >> max_iter 25, so plain min-propagation
    # would NOT converge — pointer jumping must.
    n = 40
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}


def test_edge_order_and_duplicates_are_irrelevant(spark):
    got = _cc(spark, [(5, 3), (3, 5), (5, 3), (9, 3)])
    assert got == {3: 3, 5: 3, 9: 3}


@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_cc_matches_union_find_reference(spark):
    """Hypothesis: on random graphs the Spark labeling must equal a plain
    union-find computed driver-side (the reference model for the operator,
    guarding the lazy-checkpoint convergence-probe rewrite)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    def ref_cc(edges):
        parent = {}

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
        # canonical label = min node id in component
        return {n: find(n) for n in parent}

    @settings(
        max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(
                lambda e: e[0] != e[1]
            ),
            min_size=1,
            max_size=30,
        )
    )
    def check(edges):
        got = _cc(spark, edges)
        assert got == ref_cc(edges)

    check()
