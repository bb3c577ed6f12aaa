"""Text-analysis operators for large-scale training-data pipelines.

All native column expressions (JVM-side, codegen'd) — language-ID scoring,
quality ratios, token counting, and document fingerprinting run directly on a
100 TB documents table with no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic. Word-boundary regexes; ASCII-only on purpose (fast path).
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in)\b",
    "es": r"\b(el|la|de|que|y)\b",
    "fr": r"\b(le|la|les|et|des)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "zh": r"(的|是|不|了|在)",
}

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    col = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(col), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars — a quality-score component."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(r"[^\w\s]")) / F.length(col)


def stopword_ratio(text: Column | str, marker_re: str = LANG_MARKERS["en"]) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(marker_re)) / token_count(col)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-hit counts per language (the n-gram language-ID heuristic)."""
    col = F.col(text) if isinstance(text, str) else text
    return {lang: F.regexp_count(col, F.lit(re)) for lang, re in LANG_MARKERS.items()}


def lang_id(text: Column | str) -> Column:
    """argmax language with a fixed-priority cascade for ties (deterministic)."""
    scores = lang_scores(text)
    langs = list(LANG_MARKERS)
    pred = F.lit(langs[-1])
    # cascade in reverse so earlier languages win ties
    for lang in reversed(langs[:-1]):
        others = [scores[o] for o in langs if o != lang]
        cond = scores[lang] >= F.greatest(*others) if len(others) > 1 else scores[lang] >= others[0]
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of casefolded,
    whitespace-collapsed text (the exact-dup canonical key)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))
