"""A/B bench harness: time a fixed query set from an ARBITRARY code tree
(e.g., a `git archive` snapshot of a prior round) in today's environment.

Purpose: separate code regressions from host-baseline drift. Round-over-
round BENCH_r{N} comparisons confound the two; running the OLD tree and the
CURRENT tree back-to-back (ideally twice, alternating order, taking per-
query minima) cancels the host out of the code comparison, and comparing
the old tree against its own committed artifact measures the host drift
directly.

Usage:
    git archive <old-commit> | tar -x -C /tmp/oldtree
    cp LASTGREEN.json /tmp/oldtree/
    python tools_bench_ab.py /tmp/oldtree  > old1.json
    python tools_bench_ab.py /root/repo    > new1.json
    python tools_bench_ab.py /root/repo    > new2.json
    python tools_bench_ab.py /tmp/oldtree  > old2.json
    # compare min(old1,old2) vs min(new1,new2), and min(old*) vs the old
    # round's BENCH artifact

Round-10 finding recorded in ARCHITECTURE.md ("Bench inflation closed"):
the unchanged r8 snapshot reproduced only 1.36x of its own BENCH_r08
numbers on the round-10 host, while HEAD matched the r8 snapshot within
~4% — the r9/r10 uniform inflation is host drift, not code.
"""

from __future__ import annotations

import json
import sys
import time

QUERIES = [
    "q14_promo_share",
    "q9_product_profit",
    "q18_large_orders",
    "ann_cosine_topk",
    "t_hopping_windows",
    "w_holt_trend",
    "q1_pricing_summary",
    "bm25_retrieval",
]


def main() -> None:
    tree = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, tree)
    from schwab_elt_etl_pipeline_spark.catalog import all_specs
    from schwab_elt_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = {s.name: s for s in all_specs() if s.name in QUERIES}
    for s in specs.values():  # warm plan shapes at tiny SF
        try:
            s.build(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    best = {n: float("inf") for n in specs}
    for _ in range(3):
        for n in specs:
            start = time.perf_counter()
            specs[n].build(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            best[n] = min(best[n], time.perf_counter() - start)
            spark.catalog.clearCache()
    print(json.dumps({"tree": tree, "queries": {n: round(t, 3) for n, t in best.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
