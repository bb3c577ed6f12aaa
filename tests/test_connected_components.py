"""connected_components: cluster semantics the pair queries can't express."""

from __future__ import annotations

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
