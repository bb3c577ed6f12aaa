"""Focused 10x A/B for the char-window ExactSubstr pair (VERDICT r12 #3).

Times ``substring_dup_spans`` / ``substring_dup_excise`` (and the excise
front-end variants) at 1x and 10x on the standard scale-stress replica,
several runs each, to separate real prefilter-shape cost from host drift.

Run idle: ``python tools_spans_excise_ab.py``. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import time

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark
from tools_scale_stress import TABLES, build_scaled


def _t(df) -> float:
    start = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SCALE_STRESS_FACTOR", "10"))
    scaled = os.environ.get("SCALE_STRESS_DIR", f"/tmp/scale_stress_x{factor}")
    runs = int(os.environ.get("AB_RUNS", "3"))
    spark = get_spark(app_name="spans-excise-ab")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{scaled}/documents.parquet"):
        build_scaled(spark, base, scaled, factor)
    for t in TABLES:
        spark.read.parquet(f"{scaled}/{t}.parquet").count()

    specs = {s.name: s for s in all_specs()}
    builds = {
        "spans": specs["substring_dup_spans"].build,
        "excise": specs["substring_dup_excise"].build,
    }
    # warm codegen at tiny sf
    warm = os.path.join(os.path.dirname(base.rstrip("/")), "sf0.001")
    for b in builds.values():
        b(spark, warm).write.format("noop").mode("overwrite").save()

    out = {}
    for name, b in builds.items():
        t1 = [round(_t(b(spark, base)), 3) for _ in range(runs)]
        tx = [round(_t(b(spark, scaled)), 3) for _ in range(runs)]
        out[name] = {
            "t_1x": t1,
            "t_10x": tx,
            "ratio_best": round(min(tx) / min(t1), 2),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
