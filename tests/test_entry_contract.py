"""Driver-contract smoke: the exact invariants the harness relies on.

Mirrors the driver's checks so a refactor that breaks the contract fails
here first: ``entry`` runs and returns rows with a stable schema;
``oracle_sql`` keys are a subset of ``queries``; every oracle is
syntactically valid DuckDB SQL against the registered views.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from schwab_elt_etl_pipeline_spark.testing.oracle import duckdb_connection


def test_entry_runs_with_stable_schema(spark):
    df1 = entrymod.entry(spark)
    schema1 = [(f.name, f.dataType.simpleString()) for f in df1.schema.fields]
    assert df1.count() >= 0
    df2 = entrymod.entry(spark)
    schema2 = [(f.name, f.dataType.simpleString()) for f in df2.schema.fields]
    assert schema1 == schema2 and len(schema1) > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 100
    # no empty oracle strings, no None leaked
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_every_oracle_parses_in_duckdb(sf_dir):
    """EXPLAIN every oracle (parse + bind against the real views) without
    executing — catches SQL typos long before the driver's gate."""
    con = duckdb_connection(sf_dir)
    try:
        for name, sql in entrymod.oracle_sql().items():
            try:
                con.execute(f"EXPLAIN {sql}")
            except duckdb.Error as exc:  # pragma: no cover
                pytest.fail(f"{name}: oracle SQL failed to bind: {exc}")
    finally:
        con.close()


def test_coverage_doc_references_resolve():
    """Every catalog-query name claimed in COVERAGE.md's gating column (the
    LAST cell of a table row) must exist in the registry — guards doc drift
    as the surface grows. Test names and function refs are exempt."""
    import re

    from schwab_elt_etl_pipeline_spark.catalog import all_specs

    names = {s.name for s in all_specs()}
    missing = set()
    for line in open("COVERAGE.md").read().splitlines():
        if not line.startswith("|"):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) < 2:
            continue
        last = cells[-1]
        m = re.fullmatch(r"`([a-z][a-z0-9_]{3,40})`(?:\s*\(.*\))?", last)
        if not m:
            continue
        ref = m.group(1)
        if ref.startswith("test_") or ref in names:
            continue
        missing.add(ref)
    assert not missing, f"COVERAGE.md gating column references unknown catalog queries: {sorted(missing)}"
