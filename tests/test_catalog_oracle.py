"""Differential tests: every oracle-backed catalog query vs DuckDB
(SURVEY §5.1) — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.testing.oracle import compare_to_oracle, duckdb_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_match(spark, sf_dir, con, spec):
    result = compare_to_oracle(spec.name, spec.build(spark, sf_dir), spec.oracle, con)
    assert result.ok, result.detail


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None], ids=lambda s: s.name)
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.build(spark, sf_dir)
    assert df.count() >= 0  # runs end-to-end with a stable schema
    assert len(df.columns) > 0
