"""Golden triangle counts on hand-computed graphs (operators/graph.py);
the catalog query adds the DuckDB oracle on the co-click derivation."""

from __future__ import annotations

from schwab_elt_etl_pipeline_spark.operators.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "u int, v int"
    ).distinct()


def _counts(df):
    return {r.item: r.n_tri for r in df.collect()}


def test_k4_every_vertex_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _counts(triangle_counts(_edges(spark, k4))) == {i: 3 for i in range(4)}


def test_path_and_star_have_no_triangles(spark):
    path = [(0, 1), (1, 2), (2, 3)]
    star = [(0, i) for i in range(1, 6)]
    assert _counts(triangle_counts(_edges(spark, path))) == {}
    assert _counts(triangle_counts(_edges(spark, star))) == {}


def test_hub_with_one_closing_edge(spark):
    # star 0-{1..4} plus edge (1,2): exactly one triangle {0,1,2}
    g = [(0, i) for i in range(1, 5)] + [(1, 2)]
    assert _counts(triangle_counts(_edges(spark, g))) == {0: 1, 1: 1, 2: 1}


def test_two_triangles_sharing_an_edge(spark):
    # {0,1,2} and {0,1,3}: vertices 0,1 sit in both
    g = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert _counts(triangle_counts(_edges(spark, g))) == {0: 2, 1: 2, 2: 1, 3: 1}
