"""Unicode scrub — pre-tokenizer text normalization with per-rule counts.

The standard cleanup stage a web corpus runs before tokenization: repair
encoding artifacts (mojibake — UTF-8 bytes mis-decoded as cp1252 and
re-encoded, the single most common crawl defect), strip zero-width and
control characters, fold exotic spaces/quotes/dashes to their ASCII
equivalents, and collapse the space runs the substitutions leave behind.
Per-rule match counts ride along so a quality gate can drop artifact-dense
documents and an audit can reconcile exactly what was rewritten.

Spark-first shape: a pure ``regexp_count`` + ``regexp_replace`` cascade —
JVM-side, whole-stage-codegen friendly, zero shuffles (the scrub runs in
the scan stage at any corpus size). No UDFs in the hot path. Patterns are
restricted to the Java/RE2-portable core (literal sequences and character
classes, no lookaround), so the SAME strings run under Java regex (Spark)
and RE2 (DuckDB oracle) with identical matches; like ``operators/pii.py``,
the module EMITS the oracle's SQL fragments so rules cannot drift.

Rule ORDER is part of the contract (each rule counts the text as already
rewritten by its predecessors, so one span never books under two rules):
mojibake repairs run FIRST — their byte sequences contain characters
(``Â``, ``â``) that later folds would otherwise mangle — then
invisible-character strips, then width/quote/dash folds, then the space
collapse LAST (substitutions upstream can create adjacent spaces).

Scope note: this is the deterministic repair core, NOT full Unicode
normalization — NFC/NFKC needs the ICU tables, which Spark SQL has no
built-in for. :func:`nfc_normalize_pandas` provides the NFC pass as an
Arrow-batched pandas UDF (the documented slow path, off the hot path and
off the catalog's oracle surface); a unit test pins it against DuckDB's
``nfc_normalize``.

Reference parity note: the reference normalizes symbol strings
(tools/schwab.py regex hygiene); corpus-scale unicode repair is the
LLM-pipeline analogue the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (rule, pattern, replacement) — applied strictly in this order. Patterns
# are portable-core regex; replacements contain no Java-special characters
# ($, \\). Mojibake entries are the cp1252 mis-decodings of the most
# common punctuation (U+2019 ' -> 'â€™', U+201C " -> 'â€œ', U+2013 – ->
# 'â€“', U+00E9 é -> 'Ã©', U+00A0 NBSP -> 'Â '); the right-double-quote
# artifact ('â€' + U+009D) is deliberately NOT repaired — its tail is a
# bare C1 control byte that the control strip removes, and a rule whose
# pattern embeds raw C1 bytes would not survive every SQL transport.
NORM_RULES: list[tuple[str, str, str]] = [
    ("moji_apos", "â€™", "'"),
    ("moji_lquote", "â€œ", '"'),
    ("moji_dash", "â€“", "-"),
    ("moji_eacute", "Ã©", "é"),
    ("moji_nbsp", r"Â\x{a0}", " "),
    # invisible characters are spelled \x{...} (the hex-codepoint escape
    # BOTH Java regex and RE2 accept), never as raw bytes an editor or SQL
    # transport could mangle: ZWSP, ZWNJ, ZWJ, WORD JOINER, BOM
    ("zero_width", r"[\x{200b}\x{200c}\x{200d}\x{2060}\x{feff}]", ""),
    ("control", r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]", ""),
    # NBSP, FIGURE SPACE, NARROW NBSP, IDEOGRAPHIC SPACE
    ("space_fold", r"[\x{a0}\x{2007}\x{202f}\x{3000}]", " "),
    ("quote_fold", "[‘’‚]", "'"),
    ("dquote_fold", "[“”„]", '"'),
    ("dash_fold", "[–—―]", "-"),
    ("ellipsis", "…", "..."),
    ("space_runs", "  +", " "),
]


# HTML strip — the stage BEFORE unicode repair in a web pipeline: drop
# script/style payloads wholesale (their text is not corpus text), drop
# comments, replace tags with a space (a tag boundary is usually a word
# boundary), unescape the common entities (&amp; strictly LAST, so
# '&amp;lt;' correctly becomes the literal '&lt;' and not '<'), fold NBSP
# entities to plain spaces, and collapse the space runs the removals
# leave. Lazy quantifiers and inline (?is) flags are in the Java/RE2
# shared core. Known, documented limitation of the regex (non-parsing)
# approach: a lone '<' in prose eats to the next '>' like any tag.
HTML_RULES: list[tuple[str, str, str]] = [
    ("script", r"(?is)<script[^>]*>.*?</script>", " "),
    ("style", r"(?is)<style[^>]*>.*?</style>", " "),
    # UNCLOSED script/style (truncated HTML is common in crawl data,
    # ADVICE r12): these run after the paired rules, so any <script>/
    # <style> still standing has no closer — drop its payload to end of
    # text rather than leak raw JS/CSS into clean_text.
    ("script_tail", r"(?is)<script[^>]*>.*$", " "),
    ("style_tail", r"(?is)<style[^>]*>.*$", " "),
    ("comment", r"(?s)<!--.*?-->", " "),
    ("tag", r"(?s)<[^>]*>", " "),
    ("ent_lt", "&lt;", "<"),
    ("ent_gt", "&gt;", ">"),
    ("ent_quot", "&quot;", '"'),
    ("ent_apos", "&#39;", "'"),
    ("ent_nbsp", "&nbsp;", " "),
    ("ent_amp", "&amp;", "&"),
    ("space_runs", "  +", " "),
]


def _cascade(
    df: DataFrame,
    rules: list[tuple[str, str, str]],
    text_col: str,
    keep_cols: tuple[str, ...],
) -> DataFrame:
    """Ordered count-then-rewrite cascade (each rule counts the text its
    predecessors already rewrote — one span never books under two rules)."""
    cur: Column = F.col(text_col)
    cols: list[Column] = [F.col(c) for c in keep_cols]
    for name, pat, rep in rules:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, rep)
    cols.append(cur.alias("clean_text"))
    return df.select(*cols)


def _cascade_sql(
    text_expr: str, rules: list[tuple[str, str, str]]
) -> tuple[list[str], str]:
    """DuckDB twin of :func:`_cascade` as composable SQL fragments:
    (per-rule ``LEN(regexp_extract_all(...)) AS n_<rule>`` exprs, the
    fully-rewritten text expr). Patterns/replacements are emitted with
    single quotes doubled (standard SQL strings don't process backslashes,
    so the regex escapes pass through verbatim)."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    counts: list[str] = []
    cur = text_expr
    for name, pat, rep in rules:
        counts.append(
            f"CAST(LEN(regexp_extract_all({cur}, '{q(pat)}')) AS INT)"
            f" AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{q(pat)}', '{q(rep)}', 'g')"
    return counts, cur


def unicode_scrub(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Normalized text + per-rule rewrite counts.

    Output: ``keep_cols`` + one ``n_<rule>`` int column per
    :data:`NORM_RULES` entry + ``clean_text``. Each count is taken on the
    text AFTER the previous rules were applied (see module docstring on
    ordering), exactly mirroring :func:`norm_sql_exprs` so the oracle
    can't drift.
    """
    return _cascade(df, NORM_RULES, text_col, keep_cols)


def html_strip(
    df: DataFrame,
    text_col: str = "text",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """HTML removed + per-rule counts (:data:`HTML_RULES`); run this
    BEFORE :func:`unicode_scrub` on raw crawl text. Same zero-shuffle
    cascade shape and the same emitted-oracle discipline
    (:func:`html_sql_exprs`)."""
    return _cascade(df, HTML_RULES, text_col, keep_cols)


def norm_sql_exprs(text_expr: str) -> tuple[list[str], str]:
    """DuckDB twin of :func:`unicode_scrub` — see :func:`_cascade_sql`."""
    return _cascade_sql(text_expr, NORM_RULES)


def html_sql_exprs(text_expr: str) -> tuple[list[str], str]:
    """DuckDB twin of :func:`html_strip` — see :func:`_cascade_sql`."""
    return _cascade_sql(text_expr, HTML_RULES)


def nfc_normalize_pandas(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full NFC normalization of ``text_col`` — the documented SLOW PATH.

    Arrow-batched pandas UDF over Python's ``unicodedata.normalize`` (the
    stdlib carries the ICU-equivalent tables Spark SQL lacks). Run this
    AFTER :func:`unicode_scrub`, and only when the corpus genuinely mixes
    composed/decomposed forms — it moves every text batch through Python,
    ~10x the cost of the JVM cascade. Kept off the catalog's oracle
    surface; ``tests/`` pins it against DuckDB's ``nfc_normalize``.
    """
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):  # type: ignore[no-untyped-def]
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return df.withColumn(text_col, _nfc(F.col(text_col)))
