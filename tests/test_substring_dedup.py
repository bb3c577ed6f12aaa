"""Substring-granular (token-window ExactSubstr) dedup: property-tested
against a sequential reference model, plus golden span semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from schwab_elt_etl_pipeline_spark.operators.dedup import substring_dedup_rebuild

_VOCAB = ["a", "b", "c"]
_K = 3

docs_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=12).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ref(texts: list[str], k: int) -> dict[int, tuple[int, int, str]]:
    """First corpus-wide window occurrence (by doc, then start) survives;
    every other occurrence drops all k of its tokens; spans merge by union."""
    seen: set[str] = set()
    dup_starts: dict[int, list[int]] = {}
    for doc_id, text in enumerate(texts):
        toks = text.strip().lower().split()
        for s in range(0, len(toks) - k + 1):
            w = " ".join(toks[s : s + k])
            if w in seen:
                dup_starts.setdefault(doc_id, []).append(s)
            else:
                seen.add(w)
    out: dict[int, tuple[int, int, str]] = {}
    for doc_id, text in enumerate(texts):
        toks = text.strip().lower().split()
        dropped = [False] * len(toks)
        for s in dup_starts.get(doc_id, []):
            for i in range(s, s + k):
                dropped[i] = True
        kept = [t for t, d in zip(toks, dropped) if not d]
        out[doc_id] = (len(toks), sum(dropped), " ".join(kept))
    return out


def _run(spark, texts: list[str], k: int) -> dict[int, tuple[int, int, str]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    return {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["deduped_text"])
        for r in substring_dedup_rebuild(df, window_tokens=k).collect()
    }


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_matches_reference_model(spark, texts):
    assert _run(spark, texts, _K) == _ref(texts, _K)


def test_copied_span_excised_second_doc_only(spark):
    span = "q w e r t y u i"  # 8 tokens, k=3 -> 6 dup windows in doc 1
    texts = [f"x1 x2 {span} x3", f"y1 {span} y2 y3"]
    got = _run(spark, texts, 3)
    assert got[0] == (11, 0, texts[0])  # first occurrence untouched
    n_tok, n_drop, rebuilt = got[1]
    assert (n_tok, n_drop) == (11, 8)  # exactly the span is removed
    assert rebuilt == "y1 y2 y3"


def test_overlapping_spans_merge(spark):
    # doc 1 duplicates two overlapping regions of doc 0; union is removed once
    texts = ["a1 a2 a3 a4 a5 a6", "z1 a1 a2 a3 a4 a5 a6 z2"]
    got = _run(spark, texts, 3)
    assert got[1] == (8, 6, "z1 z2")


def test_short_docs_never_windowed(spark):
    texts = ["a b", "a b"]  # shorter than k: exact dups but no window
    got = _run(spark, texts, 3)
    assert got[0] == (2, 0, "a b") and got[1] == (2, 0, "a b")


def test_fingerprint_key_equals_raw_key(spark, sf_dir):
    """The 8-byte-shuffle scale path produces byte-identical results to the
    raw-text key on the real corpus."""
    from schwab_elt_etl_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    raw = {
        r["doc_id"]: tuple(r)
        for r in substring_dedup_rebuild(docs, window_tokens=8).collect()
    }
    fp = {
        r["doc_id"]: tuple(r)
        for r in substring_dedup_rebuild(
            docs, window_tokens=8, fingerprint_key=True
        ).collect()
    }
    assert raw == fp
