"""Oracle-check specific catalog queries by name (Spark vs DuckDB), the
same comparator the driver gate uses — for verifying that an optimization
left a query's results bit-identical before it lands.

Usage: python tools_oracle_check.py <name> [name ...]
(env: SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.01)
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
    names = set(sys.argv[1:])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    con = duckdb_connection(sf)
    fails: list[str] = []
    for spec in all_specs():
        if spec.name not in names:
            continue
        names.discard(spec.name)
        try:
            if spec.oracle is None:
                n = spec.build(spark, sf).count()
                status = f"rows-only({n})"
            else:
                r = compare_to_oracle(
                    spec.name, spec.build(spark, sf), spec.oracle, con
                )
                status = "OK" if r.ok else f"FAIL: {r.detail[:300]}"
                if not r.ok:
                    fails.append(spec.name)
        except Exception as ex:  # noqa: BLE001
            status = f"ERR: {ex}"
            fails.append(spec.name)
            traceback.print_exc()
        print(f"{spec.name:35s} {status}", flush=True)
    for n in names:
        print(f"{n:35s} NOT FOUND")
        fails.append(n)
    spark.stop()
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
