"""Curation wave 7 behavior pins: the web_curation_e2e chain's stage
EFFECTS (the catalog oracle certifies exact values; these assert the
qualitative contracts a reviewer checks first), and the PSL catalog
query's family coverage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog.curation7 import (
    psl_registrable_domain_q,
    web_curation_e2e,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def manifest(spark):
    return web_curation_e2e(spark, SF).cache()


def test_e2e_purges_mirror_farm_and_blocked_domain(spark, manifest):
    doms = {r.domain for r in manifest.select("domain").distinct().collect()}
    assert "mirrorfarm.org" not in doms  # dup_farm verdict
    assert "spamnet.example" not in doms  # blocklist verdict
    # PSL private suffixes survive as PER-USER domains
    assert any(d.endswith(".github.io") for d in doms)
    assert "github.io" not in doms
    assert any(d.endswith("media.co.uk") for d in doms)


def test_e2e_offsets_are_dense_per_source(spark, manifest):
    """tok_offset is the exact running sum of n_tok per source in doc_id
    order — the packing contract a trainer's loader depends on."""
    rows = sorted(
        manifest.select("source", "doc_id", "n_tok", "tok_offset").collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    run: dict[str, int] = {}
    for r in rows:
        assert r.tok_offset == run.get(r.source, 0), r
        run[r.source] = r.tok_offset + r.n_tok
    assert all(v > 0 for v in run.values())


def test_e2e_no_duplicate_canonical_membership(spark, manifest):
    # keep-first stages leave at most one row per doc
    n = manifest.count()
    assert manifest.select("doc_id").distinct().count() == n
    assert 0 < n < 500


def test_psl_query_exercises_every_rule_family(spark):
    df = psl_registrable_domain_q(spark, SF)
    got = {r.host: r.domain for r in df.collect()}
    # public-suffix hosts have NO registrable domain
    assert got["github.io"] is None
    # exception rule
    assert got["www.ck"] == "www.ck"
    assert got["a.city.kobe.jp"] == "city.kobe.jp"
    # private suffix keeps the user label
    assert all(
        d == h for h, d in got.items()
        if h.startswith("u") and h.endswith(".github.io") and "deep" not in h
    )
    # unknown TLD -> implicit '*' default (last two labels)
    internals = {h: d for h, d in got.items() if h.endswith(".internal")}
    assert internals and all(h == d for h, d in internals.items())
