"""ANN quality tests: the approximate variants must actually approximate —
recall@10 against the exact brute-force baseline."""

from __future__ import annotations

from schwab_elt_etl_pipeline_spark.catalog.similarity import (
    ann_bucketed_topk,
    ann_cosine_topk,
    ann_ivf_kmeans,
)


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["vec_id"])
    return out


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    exact = _topk_sets(ann_cosine_topk(spark, sf_dir))
    ivf = _topk_sets(ann_ivf_kmeans(spark, sf_dir))
    lsh = _topk_sets(ann_bucketed_topk(spark, sf_dir))

    def recall(approx):
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        return hits / total

    # The synthetic embeddings are UNIFORM RANDOM, so no partitioning
    # correlates with cosine neighborhoods — expected recall ≈ the probed
    # fraction of the corpus (IVF: 2/16, sign-LSH: ~1/16). These floors assert
    # the machinery probes what it claims; real clustered embeddings do far
    # better by construction.
    assert recall(ivf) >= 0.10, f"IVF recall below probed fraction: {recall(ivf)}"
    assert recall(lsh) >= 0.03, f"LSH recall below probed fraction: {recall(lsh)}"
    # structure: ≤ k results per query, drawn from the corpus, no self-matches
    for q, ids in ivf.items():
        assert len(ids) <= 10 and q not in ids
    # determinism: seeded k-means + tiebreaks → identical re-run
    assert _topk_sets(ann_ivf_kmeans(spark, sf_dir)) == ivf
