"""Capture .explain("formatted") for headline queries into plans/r13/.

Usage: python tools_r13_plans.py [suffix] [name ...]
  suffix: "before" or "after" (default "before")
  names:  headline query names (default: all headline queries)

Writes plans/r13/<name>_<suffix>.txt. Building a DataFrame may run small
driver-side jobs for iterative trainers (kmeans/BPE collect per round);
the explain itself is plan-only.
"""

from __future__ import annotations

import os
import sys

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    names = set(args[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="r13-plans")
    for spec in all_specs():
        if not spec.headline:
            continue
        if names and spec.name not in names:
            continue
        try:
            df = spec.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building/explaining: {exc}"
        path = os.path.join(out_dir, f"{spec.name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
