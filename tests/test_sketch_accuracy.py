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
