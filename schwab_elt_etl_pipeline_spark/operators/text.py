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


def doc_gram_hashes(
    docs, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document DISTINCT word-n-gram fingerprints: (doc_id, gh) rows,
    ``gh`` = ``xxhash64`` of the space-joined n-gram (same whitespace
    tokenization as the novelty/dedup family). 8-byte keys so downstream
    joins and indexes never shuffle gram text. Docs with fewer than ``n``
    tokens emit no rows."""
    from pyspark.sql import functions as F

    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    grams = F.when(
        F.size(F.col("_toks")) < n, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            f"transform(sequence(1, size(_toks) - {n - 1}),"
            f" i -> concat_ws(' ', slice(_toks, i, {n})))"
        )
    )
    mat = (
        docs.withColumn("_toks", toks)
        .select(F.col(id_col).alias("doc_id"), F.array_distinct(grams).alias("_g"))
        .localCheckpoint(eager=False)  # Generate over a lambda-built array
    )
    return mat.select(
        "doc_id", F.explode("_g").alias("_gram")
    ).select("doc_id", F.xxhash64("_gram").alias("gh"))


def first_seen_novelty(
    docs, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
):
    """Per-document FIRST-OCCURRENCE novelty: the fraction of the doc's
    distinct n-grams whose corpus-wide minimum doc_id is this doc — i.e.
    content this document introduced, in doc_id order. The prefix-ordered
    sibling of the symmetric ``ngram_novelty`` (df == 1), and the batch
    contract for the incremental streaming index
    (``streaming/corpus.py update_gram_index``): a stream drained in
    ascending doc_id order reproduces these rows exactly. One gram-keyed
    min-aggregate + one join back, 8-byte keys only."""
    from pyspark.sql import functions as F

    dg = doc_gram_hashes(docs, n, id_col, text_col)
    first = dg.groupBy("gh").agg(F.min("doc_id").alias("_first"))
    return (
        dg.join(first, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("_first") == F.col("doc_id"), 1)).alias(
                "n_new"
            ),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_new",
            F.round(F.col("n_new").cast("double") / F.col("n_grams"), 6).alias(
                "novelty"
            ),
        )
    )
