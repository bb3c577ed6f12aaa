"""Accuracy gates for sketch operators (no SQL oracle possible — sketch
internals are engine-specific, so correctness is a bounded-error property
against the exact answer, same pattern as test_minhash_accuracy)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog.analytics4 import a_approx_quantiles
from schwab_elt_etl_pipeline_spark.sources import load_table


def test_approx_quantiles_rank_error(spark, sf_dir):
    """approx_percentile(…, 10000) guarantees rank error ≤ n/10000 ≈ exact at
    test scale; assert the sketch answer's true rank is within 1 % of the
    requested quantile for every event_type."""
    approx = {r["event_type"]: r for r in a_approx_quantiles(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    for etype, row in approx.items():
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        assert row["n"] == n
        for p, got in ((0.5, row["p50"]), (0.9, row["p90"]), (0.99, row["p99"])):
            # true rank of the sketch's answer (rightmost position ≤ got)
            import bisect

            rank = bisect.bisect_right(vals, got) / n
            assert abs(rank - p) <= 0.01 + 1.0 / n, (etype, p, got, rank)


def test_hll_partitioned_merge_accuracy(spark, sf_dir):
    """Union-merged daily HLL sketches must estimate per-type distinct users
    within the sketch's error envelope (lgK=12 -> ~1.6% RSE; allow 5%)."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics5 import a_hll_partitioned_merge
    from schwab_elt_etl_pipeline_spark.sources import load_table
    from pyspark.sql import functions as F

    approx = {
        r["event_type"]: r["approx_users"]
        for r in a_hll_partitioned_merge(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) <= max(0.05 * exact[k], 2), (k, est, exact[k])


def test_heavy_hitters_sketch_matches_exact_head(spark, sf_dir):
    """With a sketch budget far above the vocabulary size the sketch is
    exact: its top-20 must equal the exact top-20 (count-keyed)."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics5 import a_heavy_hitters_sketch
    from schwab_elt_etl_pipeline_spark.catalog.llm_text import token_vocab_topk

    sk = {
        r["token"]: r["freq"]
        for r in a_heavy_hitters_sketch(spark, sf_dir).collect()
    }
    exact = [
        (r["token"], r["freq"]) for r in token_vocab_topk(spark, sf_dir).collect()
    ][:20]
    for token, freq in exact:
        assert sk.get(token) == freq, (token, freq, sk.get(token))
