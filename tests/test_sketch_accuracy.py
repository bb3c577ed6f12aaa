"""Accuracy gates for sketch operators.

The catalog queries now emit verdict-level certificates (exact anchors +
within-tolerance booleans, the same pattern as the MinHash/SimHash verified
pairs), so these tests assert (a) every verdict is TRUE on real data and
(b) the exact anchors agree with an independently computed exact answer —
i.e. the certificate itself is checked against ground truth, not just
trusted.
"""

from __future__ import annotations

import bisect

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog.analytics4 import a_approx_quantiles
from schwab_elt_etl_pipeline_spark.sources import load_table


def test_approx_quantiles_certificate(spark, sf_dir):
    """All rank-window verdicts must hold, and the exact anchors must match
    a driver-side sorted-list quantile computed independently."""
    rows = {r["event_type"]: r for r in a_approx_quantiles(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    for etype, row in rows.items():
        assert row["p50_in_window"] and row["p90_in_window"] and row["p99_in_window"], row
        vals = sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        assert row["n"] == n
        for p, got in (
            (0.5, row["exact_p50"]),
            (0.9, row["exact_p90"]),
            (0.99, row["exact_p99"]),
        ):
            # exact continuous (interpolated) percentile over the sorted list
            idx = p * (n - 1)
            lo, hi = int(idx), min(int(idx) + 1, n - 1)
            expect = vals[lo] + (idx - lo) * (vals[hi] - vals[lo])
            assert abs(got - expect) <= 1e-6, (etype, p, got, expect)


def test_hll_partitioned_merge_certificate(spark, sf_dir):
    """within_tol must hold for every type; the exact anchor must equal an
    independent exact distinct count; the daily-sketch count must equal the
    number of distinct days."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics5 import a_hll_partitioned_merge

    rows = {r["event_type"]: r for r in a_hll_partitioned_merge(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: (r["nu"], r["nd"])
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            F.countDistinct(F.to_date("ts")).alias("nd"),
        )
        .collect()
    }
    assert set(rows) == set(exact)
    for k, row in rows.items():
        assert row["within_tol"], (k, row)
        assert row["exact_users"] == exact[k][0]
        assert row["n_daily_sketches"] == exact[k][1]


def test_heavy_hitters_sketch_certificate(spark, sf_dir):
    """Every exact heavy hitter (freq ≥ total/200) must be found in the
    sketch top-k with a within-tolerance estimate, and the emitted heavy set
    must exactly equal the threshold set computed from the exact vocabulary."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics5 import (
        _HH_DEN,
        a_heavy_hitters_sketch,
    )

    rows = a_heavy_hitters_sketch(spark, sf_dir).collect()
    assert rows, "no heavy hitters emitted"
    for r in rows:
        assert r["in_sketch_topk"], r
        assert r["est_within_tol"], r

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    )
    total = sum(r["freq"] for r in freq)
    expect = {r["token"]: r["freq"] for r in freq if r["freq"] * _HH_DEN >= total}
    got = {r["token"]: r["exact_freq"] for r in rows}
    assert got == expect
