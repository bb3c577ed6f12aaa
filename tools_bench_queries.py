"""Time specific headline queries with the bench methodology (plan-shape
warm at sf0.001, interleaved best-of-N, noop sink) without running the whole
bench — for before/after A/B during optimization.

Usage: python tools_bench_queries.py <name> [name ...]
(env: SPARK_GRAFT_SF_DIR default /root/testdata/sf0.1, SPARK_GRAFT_BENCH_RUNS
default 3)
"""

from __future__ import annotations

import os
import sys
import time

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    spark = get_spark(app_name="bench-queries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = [s for s in all_specs() if s.name in names]
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    for spec in specs:
        try:
            spec.build(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    spark.catalog.clearCache()
    best = {s.name: float("inf") for s in specs}
    for _ in range(runs):
        for spec in specs:
            start = time.perf_counter()
            spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best[spec.name] = min(best[spec.name], time.perf_counter() - start)
            spark.catalog.clearCache()
    for n, t in best.items():
        print(f"{n:35s} {t:.3f}s (best of {runs})")
    spark.stop()


if __name__ == "__main__":
    main()
