"""Graph motif operators over canonical edge lists.

Input convention: an undirected graph as one row per edge with ``u < v``
(dedup'd). ``triangle_counts`` is the degree-oriented wedge-join algorithm —
see the scale analysis in ``catalog/analytics8.py graph_triangle_counts``
(the catalog query derives the co-click edge list and delegates here).
Companion to ``operators/dedup.connected_components`` (components) and the
walk/PageRank iterations in ``catalog/analytics6.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
    broadcast_labels: bool = True,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over a directed
    edge list → ``(node, label)`` after ``rounds`` deterministic updates.

    Every node adopts the label the most in-neighbors carried at the
    previous round; ties break toward the smallest label; seed = own id.
    The total tie-break makes the synchronous schedule exactly reproducible
    (asynchronous LPA is not), which is what lets the catalog query certify
    it against an unrolled-CTE oracle. Per round: one node-keyed equi-join
    of edges against the node-sized label table (broadcast while labels fit
    — pass ``broadcast_labels=False`` at graph scales where they don't, and
    the same plan degrades to a shuffled hash join on the node key), one
    map-side-combinable vote count, one ``max_by`` argmax. Nodes with no
    in-edges keep no row after round 1 — feed a symmetric edge set (as the
    co-click builder does) when every node must survive.
    """
    labels = edges.select(F.col(src).alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(rounds):
        prev = labels.select(F.col("node").alias("_p_node"), "label")
        if broadcast_labels:
            prev = F.broadcast(prev)
        votes = (
            edges.join(prev, edges[src] == F.col("_p_node"))
            .groupBy(F.col(dst).alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # min_by over (-cnt, label): most votes first, then SMALLEST label —
        # only the count (always numeric) is negated, so the tie-break works
        # for any orderable label type (string vertex ids included), unlike
        # a max_by over (cnt, -label) which silently requires numeric ids.
        labels = votes.groupBy("node").agg(
            F.min_by(
                "label", F.struct((-F.col("cnt")).alias("_nc"), F.col("label"))
            ).alias("label")
        )
    return labels


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle counts: (item, n_tri), vertices in ≥1 triangle.

    Orient each edge from its (degree, id)-smaller endpoint to the larger;
    the oriented graph is a DAG where every triangle has exactly one apex
    with two out-edges, so wedges (a→b, a→c) joined against the oriented
    closing edge (b→c) count each triangle once. Orientation caps
    out-degree at O(√m) → the wedge intermediate is O(m^1.5), not
    O(Σ deg²). Degrees broadcast (node-sized); ``edges``/``oriented`` are
    lazily checkpointed because three consumers read each.
    """
    edges = edges.localCheckpoint(eager=False)
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ranked = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint(eager=False)
    o1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    o2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = o1.join(o2, "a").filter(F.col("b") != F.col("c"))
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
