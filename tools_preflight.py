"""Driver-gate pre-flight: mirror the correctness sample locally.

The driver's per-round gate runs the FIRST 50 registry entries (stalest
cohort + every never-sampled query, see the rotation contract in README)
at sf0.01, Spark vs the DuckDB oracle. This tool runs exactly that window
with the same comparator (`testing/oracle.py`) so a round can be
pre-flighted before the driver samples it.

Run from the repo root: ``python tools_preflight.py``
(env: SPARK_GRAFT_SF_DIR base dir, default /root/testdata/sf0.01;
PREFLIGHT_WINDOW sample size, default 50). Exits non-zero on any failure.
"""

from __future__ import annotations

import os
import sys
import traceback

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark
from schwab_elt_etl_pipeline_spark.testing.oracle import (
    compare_to_oracle,
    duckdb_connection,
)


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    window = int(os.environ.get("PREFLIGHT_WINDOW", "50"))
    spark = get_spark(app_name="preflight", shuffle_partitions=8)
    con = duckdb_connection(sf)
    fails: list[str] = []
    for i, spec in enumerate(all_specs()[:window]):
        try:
            if spec.oracle is None:
                n = spec.build(spark, sf).count()
                status = f"rows-only({n})"
            else:
                r = compare_to_oracle(
                    spec.name, spec.build(spark, sf), spec.oracle, con
                )
                status = "OK" if r.ok else f"FAIL: {r.detail[:200]}"
                if not r.ok:
                    fails.append(spec.name)
        except Exception as ex:  # noqa: BLE001 — report and continue
            status = f"ERR: {ex}"
            fails.append(spec.name)
            traceback.print_exc()
        print(f"{i:2d} {spec.name:35s} {status}", flush=True)
    print("FAILS:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
