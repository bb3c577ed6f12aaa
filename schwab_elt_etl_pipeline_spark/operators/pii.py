"""PII scrub — regex-native redaction with per-class counts.

The standard curation stage between boilerplate scrub and dedup: emails,
payment-card numbers, IPv4 addresses, and phone numbers are replaced with
typed placeholder tokens, and the per-class match counts ride along so a
downstream quality gate can drop PII-dense documents and an audit can
reconcile exactly what was redacted.

Spark-first shape: pure ``regexp_count`` + ``regexp_replace`` expression
work — JVM-side, whole-stage-codegen friendly, embarrassingly parallel
(zero shuffles; the scrub runs in the scan stage at any corpus size). No
UDFs. Patterns are deliberately lookaround-free so the SAME strings run
under Java regex (Spark) and RE2 (DuckDB oracle) with identical matches.

Class ORDER is part of the contract: email → card → IPv4 → phone, each
class counted on the text as already scrubbed by the classes before it
(cards carry 4-digit groups a looser phone pattern could nibble at, and a
dotted phone spelling must not be half-eaten by the IPv4 rule), so counts
never double-book one span under two classes.

Relationship to ``pii_redact_scrub`` (catalog/curation2.py, r8): that query
pinned the redact-and-count shape on an email/SSN/phone rule set with
counts over the RAW text. This module is the operator-grade successor the
r10 verdict asked for — credit-card and IPv4 classes added, word-boundary
discipline so glued digits never half-match, and sequential-class counting
(each class counts the text already scrubbed by its predecessors) so one
span can never be booked under two classes. Both stay in the catalog: the
r8 query certifies independent-count semantics, this one the ordered
pipeline stage.

Reference parity note: the reference pipeline has no PII stage (its rows
are exchange quotes); this is part of the LLM-training-data family the
brief adds on top (tools/schwab.py's regex symbol hygiene is the nearest
analogue in spirit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (class, pattern, replacement token) — applied strictly in this order.
# Patterns restrict to the portable regex core (char classes, bounded
# quantifiers, \b word boundaries): identical semantics in Java and RE2.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    # IPv4 before phone: the trailing \b + {1,3} groups mean a dotted
    # phone ('555.123.4567', 4-digit tail) can never match as an IP, but
    # scrubbing IPs first still documents the intent explicitly
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # Covered phone spellings (the EXPLICIT contract, ADVICE r12): a bare
    # 3-3-4 triple matches only with CONSISTENT '-' or '.' separators
    # ('555-123-4567', '555.123.4567'); space/mixed separators match only
    # behind a strong phone signal — a '(ddd)' area code or a '+' prefix
    # ('(555) 123-4567', '(555) 123 4567', '+555 123 4567'). NOT covered,
    # deliberately: 10 contiguous digits ('5551234567') AND bare
    # space-separated triples ('555 123 4567', '512 768 1024') — in corpus
    # text those shapes are ids/timestamps/numeric tables far more often
    # than phones, and redacting them destroys non-PII content wholesale.
    # Enumerated alternation, not a backreference (RE2 has none).
    (
        "phone",
        r"(?:\+\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"
        r"|\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}"
        r"|\b\d{3}-\d{3}-\d{4}"
        r"|\b\d{3}\.\d{3}\.\d{4})\b",
        "<PHONE>",
    ),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Scrubbed text + per-class redaction counts.

    Output: ``keep_cols`` + ``n_email, n_card, n_ip, n_phone`` (int) +
    ``scrubbed_text``. Each count is taken on the text AFTER the previous
    classes were replaced (see module docstring on ordering), exactly
    mirroring :func:`pii_count_sql_exprs` so the oracle can't drift.
    """
    cur: Column = F.col(text_col)
    cols: list[Column] = [F.col(c) for c in keep_cols]
    for name, pat, tok in PII_RULES:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, tok)
    cols.append(cur.alias("scrubbed_text"))
    return df.select(*cols)


def pii_count_sql_exprs(text_expr: str) -> tuple[list[str], str]:
    """DuckDB twin of :func:`pii_scrub` as composable SQL fragments:
    (per-class ``LEN(regexp_extract_all(...)) AS n_<class>`` exprs, the
    fully-scrubbed text expr). Patterns are emitted verbatim — standard
    SQL strings don't process backslashes, and the portable-core patterns
    contain no quotes."""
    counts: list[str] = []
    cur = text_expr
    for name, pat, tok in PII_RULES:
        counts.append(
            f"CAST(LEN(regexp_extract_all({cur}, '{pat}')) AS INT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{tok}', 'g')"
    return counts, cur
