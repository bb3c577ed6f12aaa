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


# ---------------------------------------------------------------------------
# Character-granular duplicate spans (dup_char_spans)
# ---------------------------------------------------------------------------

from schwab_elt_etl_pipeline_spark.operators.dedup import dup_char_spans  # noqa: E402


def _spans(spark, texts: list[str], L: int) -> dict[int, list[tuple]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    out: dict[int, list[tuple]] = {}
    for r in dup_char_spans(df, min_len=L).collect():
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"], r["n_windows"])
        )
    return {k: sorted(v) for k, v in out.items()}


def _ref_spans(texts: list[str], L: int) -> dict[int, list[tuple]]:
    """Sequential reference: corpus-wide L-gram counts, then interval union
    (merge overlap AND zero-gap adjacency) per doc."""
    from collections import Counter

    counts = Counter(
        t[i : i + L] for t in texts for i in range(len(t) - L + 1)
    )
    out: dict[int, list[tuple]] = {}
    for doc_id, t in enumerate(texts):
        dup_pos = [
            i + 1 for i in range(len(t) - L + 1) if counts[t[i : i + L]] >= 2
        ]
        spans, cur = [], None
        for p in dup_pos:
            if cur is not None and p <= cur[1] + 1:  # overlap or adjacent
                cur = (cur[0], max(cur[1], p + L - 1), cur[2] + 1)
            else:
                if cur:
                    spans.append(cur)
                cur = (p, p + L - 1, 1)
        if cur:
            spans.append(cur)
        if spans:
            out[doc_id] = sorted((s, e, e - s + 1, n) for s, e, n in spans)
    return out


def test_char_spans_cross_doc_copy(spark):
    # A 12-char block pasted into both docs -> one maximal span in EACH doc
    # (character semantics count every occurrence, not occurrences-after-
    # the-first: the output is a duplication MAP, excision policy is the
    # caller's).
    texts = ["AAAA_SHARED_BLOCK_AAAA" + "qrs" * 4, "zzz" + "AAAA_SHARED_BLOCK_AAAA" + "tuv" * 4]
    assert _spans(spark, texts, 8) == _ref_spans(texts, 8)


def test_char_spans_within_doc_repeat(spark):
    # The same 10-char run twice INSIDE one doc is duplication too.
    t = "0123456789-filler-middle-0123456789-end!!"
    got = _spans(spark, [t], 10)
    assert got == _ref_spans([t], 10)
    assert 0 in got and len(got[0]) == 2  # two separated maximal spans


def test_char_spans_adjacent_windows_merge(spark):
    # Consecutive duplicated window positions merge into ONE maximal span
    # covering the whole copied block (maximality: block length > L).
    block = "the-quick-brown-fox-jumps-over-lazy-dogs"  # 40 chars
    texts = [block + "#first-unique-suffix", "pad*" + block + "@second-suffix"]
    got = _spans(spark, texts, 8)
    assert got == _ref_spans(texts, 8)
    # the whole block is one span in each doc
    assert got[0][0][:2] == (1, len(block))
    assert got[1][0][:2] == (5, 4 + len(block))


def test_char_spans_no_duplication_empty(spark):
    texts = ["entirely unique text one", "another text with nothing shared!"]
    assert _spans(spark, texts, 10) == {}


def test_char_spans_short_docs_skipped(spark):
    # Docs shorter than L yield no windows (sequence(1, n<1) would descend).
    texts = ["tiny", "tiny"]
    assert _spans(spark, texts, 10) == {}


# ---------------------------------------------------------------------------
# Character-granular excision (dup_char_excise_rebuild)
# ---------------------------------------------------------------------------

from schwab_elt_etl_pipeline_spark.operators.dedup import (  # noqa: E402
    dup_char_excise_rebuild,
)


def _ref_excise(texts: list[str], L: int) -> dict[int, tuple[int, int, str]]:
    """Sequential reference: corpus-wide first L-gram occurrence (doc, pos)
    survives; later occurrences drop all L of their chars; rebuild."""
    seen: set[str] = set()
    dup_starts: dict[int, list[int]] = {}
    for doc_id, t in enumerate(texts):
        for i in range(len(t) - L + 1):
            g = t[i : i + L]
            if g in seen:
                dup_starts.setdefault(doc_id, []).append(i)
            else:
                seen.add(g)
    out = {}
    for doc_id, t in enumerate(texts):
        if not t:
            continue  # no char rows -> no output row (UNNEST semantics)
        dropped = [False] * len(t)
        for s in dup_starts.get(doc_id, []):
            for i in range(s, s + L):
                dropped[i] = True
        kept = "".join(c for c, d in zip(t, dropped) if not d)
        out[doc_id] = (len(t), sum(dropped), kept)
    return out


def _run_excise(spark, texts: list[str], L: int) -> dict[int, tuple[int, int, str]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    )
    return {
        r["doc_id"]: (r["n_chars"], r["n_dropped"], r["deduped_text"])
        for r in dup_char_excise_rebuild(df, min_len=L).collect()
    }


def test_char_excise_first_occurrence_survives(spark):
    block = "SHARED-BLOCK-OF-TEXT!"  # 21 chars, repeated verbatim
    texts = ["intro " + block + " tail-one", "pad " + block + " tail-two", "x"]
    got = _run_excise(spark, texts, 12)
    assert got == _ref_excise(texts, 12)
    assert block in got[0][2]          # first occurrence kept intact
    assert block not in got[1][2]      # later occurrence excised
    assert got[2] == (1, 0, "x")       # short doc passes through whole


def test_char_excise_within_doc_repeat(spark):
    t = "abcdefghij--middle--abcdefghij--end"
    got = _run_excise(spark, [t], 10)
    assert got == _ref_excise([t], 10)
    assert got[0][1] >= 10  # the second run of the block is dropped


def test_char_excise_no_dups_is_identity(spark):
    texts = ["totally unique text", "another different one entirely"]
    got = _run_excise(spark, texts, 10)
    assert got == {i: (len(t), 0, t) for i, t in enumerate(texts)}


def test_char_excise_matches_reference_on_overlaps(spark):
    # overlapping duplicated windows inside one doc: coverage union, not
    # double-count
    t = "0123456789" * 4  # every 10-gram repeats at stride 10 (and offsets)
    got = _run_excise(spark, [t], 10)
    assert got == _ref_excise([t], 10)
