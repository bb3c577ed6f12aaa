"""Reference-model tests for passage-level dedup and BM25 retrieval.

Same pattern as test_market_and_properties' MERGE model test: a pure-Python
reference implementation is the spec, hypothesis drives randomized corpora
at passage-collision-heavy settings, and the Spark operator must agree
exactly (dedup) or to float tolerance (BM25).
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from schwab_elt_etl_pipeline_spark.operators.dedup import passage_dedup_rebuild

# Tiny vocabulary + short passages force cross-document passage collisions.
_VOCAB = ["a", "b", "c"]
_P = 3  # tokens per passage in the property test

docs_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=11).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ref_passage_dedup(texts: list[str], p: int) -> dict[int, tuple[int, int, str]]:
    """Reference model: first corpus-wide occurrence wins, by (doc, position)."""
    seen: set[str] = set()
    out: dict[int, tuple[int, int, str]] = {}
    for doc_id, text in enumerate(texts):
        toks = text.strip().lower().split()
        kept: list[str] = []
        n_passages = 0
        for start in range(0, len(toks), p):
            passage = " ".join(toks[start : start + p])
            n_passages += 1
            if passage not in seen:
                seen.add(passage)
                kept.append(passage)
        out[doc_id] = (n_passages, len(kept), " ".join(kept))
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(texts=docs_strategy)
@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_passage_dedup_matches_reference_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_passages"], r["n_kept"], r["deduped_text"])
        for r in passage_dedup_rebuild(df, passage_tokens=_P).collect()
    }
    assert got == _ref_passage_dedup(texts, _P)


def test_passage_dedup_global_invariants(spark, sf_dir):
    """On the real corpus: every passage of every rebuilt text is globally
    unique, and kept counts are consistent with the originals."""
    from schwab_elt_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = passage_dedup_rebuild(docs, passage_tokens=20).collect()
    seen: set[str] = set()
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_passages"]
        toks = r["deduped_text"].split() if r["deduped_text"] else []
        passages = [
            " ".join(toks[i : i + 20]) for i in range(0, len(toks), 20)
        ]
        # NOTE: a kept passage shorter than 20 tokens (document tail) can
        # merge with the following kept passage when re-split; only assert
        # on documents whose kept passages are all full-width or singular.
        if r["n_kept"] == len(passages):
            for passage in passages:
                assert passage not in seen, f"duplicate passage survived: {passage!r}"
                seen.add(passage)


def test_bm25_matches_python_reference(spark, sf_dir):
    """Catalog BM25 vs an independently coded Python reference over the real
    corpus (same rational-idf formula, arbitrary evaluation order) — scores
    agree to 1e-6 and the emitted doc set matches exactly."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics6 import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        bm25_retrieval,
    )
    from schwab_elt_etl_pipeline_spark.sources import load_table

    corpus = {
        r["doc_id"]: r["text"].strip().lower().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n_docs = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n_docs
    df_t = {
        t: sum(1 for toks in corpus.values() if t in toks) for t in _BM25_TERMS
    }

    def ref_score(toks: list[str]) -> float:
        dl = len(toks)
        score = 0.0
        for t in _BM25_TERMS:
            tf = toks.count(t)
            idf = (n_docs - df_t[t] + 0.5) / (df_t[t] + 0.5)
            sat = (tf * (_BM25_K1 + 1)) / (
                tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl / avgdl)
            )
            score += idf * sat
        return score

    expect = {
        doc_id: ref_score(toks)
        for doc_id, toks in corpus.items()
        if any(t in toks for t in _BM25_TERMS)
    }
    got = {r["doc_id"]: r["bm25"] for r in bm25_retrieval(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for doc_id, score in got.items():
        assert abs(score - expect[doc_id]) <= 1e-6, (doc_id, score, expect[doc_id])


def test_exact_k_sample_contract(spark, sf_dir):
    """Exactly k rows per stratum, deterministic across runs."""
    from schwab_elt_etl_pipeline_spark.operators.sampling import exact_k_per_group
    from schwab_elt_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    got = exact_k_per_group(docs, "doc_id", "source", 5).collect()
    per = {}
    for r in got:
        per.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 5 for v in per.values())
    again = {
        (r["source"], r["doc_id"])
        for r in exact_k_per_group(docs, "doc_id", "source", 5).collect()
    }
    assert again == {(r["source"], r["doc_id"]) for r in got}


def test_salted_draws_are_near_independent(spark, sf_dir):
    """Two salts must give near-independent draws (expected overlap ≈ k/n =
    20% here). Regression: the original _SALT_STEP was ≡ −4 mod the
    reduction prime, so salted orderings were ~identical (99% overlap)."""
    from schwab_elt_etl_pipeline_spark.operators.sampling import exact_k_per_group
    from schwab_elt_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    base = {r["doc_id"] for r in exact_k_per_group(docs, "doc_id", "source", 5).collect()}
    for salt in (1, 3):
        alt = {
            r["doc_id"]
            for r in exact_k_per_group(docs, "doc_id", "source", 5, salt=salt).collect()
        }
        overlap = len(base & alt) / len(base)
        assert overlap <= 0.6, f"salt {salt}: draws not independent ({overlap:.0%})"


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1"]), st.integers(1, 30)),
        min_size=1,
        max_size=12,
    )
)
def test_sequence_packing_matches_reference(spark, docs):
    """Concatenate-and-chunk offsets vs a driver-side running sum, on random
    (source, token-count) corpora. Verifies the window frame (exclusive
    prefix), the integer division, and the boundary-crossing count."""
    import schwab_elt_etl_pipeline_spark.catalog.curation2 as c2
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [(i, src, "w " * n) for i, (src, n) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # mirror the catalog query's body over this frame (the catalog entry is
    # bound to the benchmark table; the algebra under test is identical)
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq_len = 7
    got = {
        r["doc_id"]: (r["tok_offset"], r["seq_first"], r["seq_last"])
        for r in df.select("doc_id", "source", n_tok.cast("long").alias("n_tok"))
        .withColumn("tok_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long"))
        .select(
            "doc_id",
            "tok_offset",
            F.expr(f"tok_offset DIV {seq_len}").alias("seq_first"),
            F.expr(f"(tok_offset + n_tok - 1) DIV {seq_len}").alias("seq_last"),
        )
        .collect()
    }
    offsets: dict[str, int] = {}
    for i, (src, n) in enumerate(docs):
        # whitespace-split of "w w ... w " (trailing space trimmed) = n tokens
        off = offsets.get(src, 0)
        assert got[i] == (off, off // seq_len, (off + n - 1) // seq_len), (i, src, n)
        offsets[src] = off + n
