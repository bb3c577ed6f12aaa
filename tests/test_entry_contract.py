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
