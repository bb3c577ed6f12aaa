"""Split-profile headline queries: DataFrame BUILD time (driver-side plan
construction, py4j chatter, any eager checkpoint barriers) vs EXECUTE time
(noop sink of the already-built DataFrame).

The r13 round found ~53% of the sf0.1 bench total was build, not execution;
this tool makes that split reproducible per query so build-cost work
(single-expr-string discipline, cached Column construction) can be targeted
and verified (guide §1: measure first; §7.3 driver-side work).

Usage: python tools_split_profile.py [name ...]   (default: all headline)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_RUNS (default 2, min over runs).

Methodology: plan-shape warm pass at sf0.001 first (same as bench.py), then
per query per round: t_build = wall-clock of spec.build(spark, sf_dir);
t_exec = wall-clock of the noop write. clearCache() between queries.
NOTE: a build that contains an EAGER localCheckpoint / persist-materialize
executes real data work inside "build" — the split is driver-vs-sink, not
strictly plan-vs-data. Cross-check suspicious rows against the query source.
"""

from __future__ import annotations

import os
import sys
import time

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark


def main() -> None:
    names = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    spark = get_spark(app_name="split-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs = [
        s
        for s in sorted((s for s in all_specs() if s.headline), key=lambda s: s.name)
        if not names or s.name in names
    ]
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for spec in specs:
            try:
                spec.build(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                pass
        spark.catalog.clearCache()
    build = {s.name: float("inf") for s in specs}
    execu = {s.name: float("inf") for s in specs}
    for _ in range(runs):
        for spec in specs:
            t0 = time.perf_counter()
            df = spec.build(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build[spec.name] = min(build[spec.name], t1 - t0)
            execu[spec.name] = min(execu[spec.name], t2 - t1)
            spark.catalog.clearCache()
    tb = te = 0.0
    print(f"{'query':38s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for spec in specs:
        b, e = build[spec.name], execu[spec.name]
        tb += b
        te += e
        print(f"{spec.name:38s} {b:7.3f} {e:7.3f} {b + e:7.3f}")
    print(f"{'TOTAL (min-of-%d each)' % runs:38s} {tb:7.3f} {te:7.3f} {tb + te:7.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
