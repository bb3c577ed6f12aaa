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


# Fast/slow tier (r13 verdict #2: the driver's pytest run must COMPLETE in
# its budget; it truncated at ~66% in r13). These are the queries whose
# oracle test costs >= ~10 s at local[4] — iterative builders paying dozens
# of sequential tiny jobs (PQ/IVF codebook training, CC pointer-jumping,
# DoReMi rounds, LSH band joins), a fixed cost no data-size reduction can
# cut. Their oracle coverage is NOT lost: the slow tier runs in the close
# gate (full suite, kept green), and the driver's own CORRECTNESS rotation
# re-verifies every catalog query on its stalest-first schedule.
_SLOW_ORACLE = {
    "ann_pq_index",
    "ann_ivfadc_index",
    "ann_ivfadc",
    "ann_pq_adc",
    "neardup_canonicalize",
    "leakage_safe_split",
    "doremi_mixture_reweight",
    "simhash_neardup",
    "minhash_lsh_neardup",
    "web_curation_e2e",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "kneser_ney_score",
    "domain_gate_purge",
}


@pytest.mark.parametrize(
    "spec",
    [
        pytest.param(
            s,
            id=s.name,
            marks=[pytest.mark.slow] if s.name in _SLOW_ORACLE else [],
        )
        for s in SPECS
        if s.oracle
    ],
)
def test_oracle_match(spark, sf_dir, con, spec):
    result = compare_to_oracle(spec.name, spec.build(spark, sf_dir), spec.oracle, con)
    assert result.ok, result.detail


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None], ids=lambda s: s.name)
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.build(spark, sf_dir)
    assert df.count() >= 0  # runs end-to-end with a stable schema
    assert len(df.columns) > 0
