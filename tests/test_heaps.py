"""Heaps vocabulary-growth curve: monotone non-decreasing type counts,
exact totals, and genuine growth on a corpus whose vocabulary keeps
expanding (the synthetic catalog tables saturate by checkpoint 1, so the
curve's shape is pinned here)."""

from __future__ import annotations

import os

from schwab_elt_etl_pipeline_spark.catalog.analytics11 import heaps_vocab_growth


def test_heaps_curve_grows_and_ends_at_vocab_size(spark, tmp_path):
    # 8 docs x 4 tokens; doc k introduces exactly one new type per token
    # slot after the first doc reuses nothing: doc k = [w_{k}a w_{k}b w0 w1]
    rows = []
    for k in range(8):
        rows.append((k, f"w{k}a w{k}b common0 common1"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sf = str(tmp_path)
    docs.write.parquet(os.path.join(sf, "documents.parquet"))

    out = {
        r.checkpoint: (r.n_tokens_prefix, r.n_types)
        for r in heaps_vocab_growth(spark, sf).collect()
    }
    assert sorted(out) == list(range(1, 9))
    # 32 tokens total -> checkpoint i covers the first 4i tokens = docs 0..i-1
    # -> types = 2 shared + 2 per doc seen
    for i in range(1, 9):
        assert out[i][0] == 4 * i
        assert out[i][1] == 2 + 2 * i
    # monotone by construction
    types = [out[i][1] for i in range(1, 9)]
    assert types == sorted(types)
