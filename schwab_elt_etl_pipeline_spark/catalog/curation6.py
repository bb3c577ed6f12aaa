"""Curation wave 6: domain-level quality gating, HTML strip, unicode scrub.

Round-12 additions (verification-bandwidth discipline, ≤8 new queries):
the per-registrable-domain gate (C4/RefinedWeb's domain stage — the one
curation tier the family still lacked) and the pre-tokenizer unicode
repair cascade. Both oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.domains import (
    apply_domain_gate,
    blocklist_df,
    domain_quality_gate,
    domain_stats,
    registrable_domain,
)
from schwab_elt_etl_pipeline_spark.operators.textnorm import (
    html_sql_exprs,
    html_strip,
    norm_sql_exprs,
    unicode_scrub,
)
from schwab_elt_etl_pipeline_spark.operators.urls import canonical_url
from schwab_elt_etl_pipeline_spark.sources import load_table

# ---------------------------------------------------------------------------
# domain_quality_gate
# ---------------------------------------------------------------------------

# Deterministic URL injection (the catalog's messy-input convention, like
# curation4's _URL_EXPR), exercising every branch of the domain machinery:
# a www-prefixed host (canonicalization must strip it), a co.uk multi-part
# suffix under a subdomain (registrable_domain must take THREE labels and
# keep the 'blog.' label out), two spellings of the same registrable
# domain (cases 0/2 must merge), a mirror farm (3 distinct pages crawled
# N/5 times -> dup_rate ~ 1), and a blocklisted ad domain. One
# dialect-portable expression string so the two sides cannot drift.
_DOM_URL = """
    'https://' ||
    CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN 'www.' || source || 'press.com'
      WHEN 1 THEN 'blog.' || source || 'news.co.uk'
      WHEN 2 THEN source || 'press.com'
      WHEN 3 THEN 'cdn.mirrorfarm.org'
      ELSE 'ads.spamnet.example'
    END || '/p/' ||
    CAST(doc_id % (CASE WHEN doc_id % 5 = 3 THEN 3 ELSE 997 END) AS STRING)
"""

_BLOCKLIST = [("spamnet.example", "ad network"), ("absent.example", "unused")]
_Q_SCALE = 400  # per-doc quality weight = LEAST(n_chars, 400)
_MIN_DOCS = 3
_MAX_DUP = 0.5
_MIN_QUALITY = 0.05


def _dom_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, domain, canonical_url, q_weight) for the injected corpus.

    Two projections, deliberately: the canonical string materializes ONCE
    in the inner select, and the domain derives from the COLUMN. Inlining
    canonical_url into the domain expression re-expands its whole tree
    (every part-parse re-evaluates the injected CASE) — measured 2.1 s vs
    0.7 s for the enrichment at sf0.1. CollapseProject keeps the boundary
    because the alias is referenced more than once by non-cheap
    expressions."""
    docs = load_table(spark, sf_dir, "documents")
    canon = F.expr(f"({_DOM_URL})")
    return docs.select(
        "doc_id",
        canonical_url(canon).alias("canonical_url"),
        F.least(F.col("n_chars"), F.lit(_Q_SCALE)).alias("q_weight"),
    ).select(
        "doc_id",
        registrable_domain(
            F.try_parse_url(F.col("canonical_url"), F.lit("HOST"))
        ).alias("domain"),
        "canonical_url",
        "q_weight",
    )


def domain_quality_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain quality gate over URL-injected documents:
    canonicalize (``operators/urls.py``), extract the registrable domain
    (heuristic PSL core, ``operators/domains.py``), aggregate doc count /
    distinct-page count / exact-integer quality sums in ONE domain-keyed
    shuffle, then verdict against a broadcast blocklist. The oracle
    reconstructs canonical page and domain algebraically from the
    synthesis rule, so any drift in www-stripping, multi-part-suffix
    handling, dup-rate arithmetic, or verdict precedence hash-mismatches."""
    stats = domain_stats(
        _dom_enriched(spark, sf_dir), quality_scale=_Q_SCALE
    )
    return domain_quality_gate(
        stats,
        blocklist_df(spark, _BLOCKLIST),
        min_docs=_MIN_DOCS,
        max_dup_rate=_MAX_DUP,
        min_quality=_MIN_QUALITY,
    )


def domain_gate_purge_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate's APPLY step over the same injected corpus: keep only
    documents whose domain verdict is ``keep`` (drops the blocked ad
    domain and the mirror farm wholesale). One broadcast semi-join on the
    14-row verdict table — the corpus never shuffles for the purge. The
    exact-membership output (doc_id, domain) makes the oracle certify the
    surviving set itself, mixture-sample style, not just its size."""
    return apply_domain_gate(
        _dom_enriched(spark, sf_dir).select("doc_id", "domain"),
        domain_quality_gate_q(spark, sf_dir),
    ).select("doc_id", "domain")


_BLOCK_VALUES = ", ".join(f"('{d}', '{r}')" for d, r in _BLOCKLIST)

# shared CTE body: per-doc (domain, page, weight) -> per-domain stats ->
# verdicts; both the gate query and its APPLY twin compose from it so the
# two oracles cannot drift
_DOM_CTE = f"""
d AS (
  SELECT doc_id,
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN source || 'press.com'
           WHEN 1 THEN source || 'news.co.uk'
           WHEN 2 THEN source || 'press.com'
           WHEN 3 THEN 'mirrorfarm.org'
           ELSE 'spamnet.example'
         END AS domain,
         'https://' ||
         CASE CAST(doc_id % 5 AS INT)
           WHEN 0 THEN source || 'press.com'
           WHEN 1 THEN 'blog.' || source || 'news.co.uk'
           WHEN 2 THEN source || 'press.com'
           WHEN 3 THEN 'cdn.mirrorfarm.org'
           ELSE 'ads.spamnet.example'
         END || '/p/' ||
         CAST(doc_id % (CASE WHEN doc_id % 5 = 3 THEN 3 ELSE 997 END)
              AS VARCHAR) AS page,
         LEAST(n_chars, {_Q_SCALE}) AS w
  FROM documents
), s AS (
  SELECT domain,
         COUNT(*) AS n_docs,
         COUNT(DISTINCT page) AS n_pages,
         CAST(COUNT(*) - COUNT(DISTINCT page) AS DOUBLE) / COUNT(*)
           AS dup_rate,
         CAST(SUM(w) AS DOUBLE) / ({_Q_SCALE} * COUNT(*)) AS mean_quality
  FROM d GROUP BY domain
), gate AS (
  SELECT s.domain, s.n_docs, s.n_pages, s.dup_rate, s.mean_quality,
         CASE WHEN b.domain IS NOT NULL THEN 'blocked'
              WHEN s.n_docs < {_MIN_DOCS} THEN 'small'
              WHEN s.dup_rate > {_MAX_DUP} THEN 'dup_farm'
              WHEN s.mean_quality < {_MIN_QUALITY} THEN 'low_quality'
              ELSE 'keep' END AS verdict,
         CASE WHEN b.domain IS NOT NULL THEN b.reason END AS block_reason
  FROM s LEFT JOIN (VALUES {_BLOCK_VALUES}) b(domain, reason)
         ON s.domain = b.domain
)"""

DOMAIN_GATE_SQL = f"""
WITH {_DOM_CTE}
SELECT domain, n_docs, n_pages, dup_rate, mean_quality, verdict,
       block_reason
FROM gate
"""

DOMAIN_PURGE_SQL = f"""
WITH {_DOM_CTE}
SELECT d.doc_id, d.domain
FROM d JOIN gate USING (domain)
WHERE gate.verdict = 'keep'
"""


# ---------------------------------------------------------------------------
# unicode_scrub
# ---------------------------------------------------------------------------

# Deterministic artifact injection: docs cycle through mojibake, zero-width
# characters, exotic spaces, curly punctuation, or space runs. Artifacts are
# authored here with \\u escapes (Python resolves them BEFORE the string
# reaches either SQL dialect, so both sides parse identical UTF-8
# literals). C0/C1 control bytes are deliberately NOT injected — a raw
# control byte inside a SQL string literal is transport-fragile; the
# control rule is covered by the unit suite instead.
_ARTIFACTS = {
    0: " itâ€™s â€œfineâ€“ Ã©tat Â\u00a0glued",
    1: " z\u200bw\u200cx\u200dy\u2060q\ufeff.",
    2: " a\u00a0b\u2007c\u202fd\u3000e",
    3: " ‘q’ “d„ – — ― …",
    4: "   runs   here",
}
_NORM_TEXT = (
    "text || CASE CAST(doc_id % 5 AS INT) "
    + " ".join(f"WHEN {k} THEN '{v}'" for k, v in _ARTIFACTS.items())
    + " END"
)


# HTML injection: docs cycle through tag wrapping with a script payload,
# attribute-carrying tags with entities, comments + the common entity set,
# or bare text. The artifacts are ASCII, so the expression is plainly
# portable in both dialects.
_HTML_TEXT = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN '<p>' || text ||
                  '</p><script>var x = 1;</script><style>.a{x:1}</style>'
      WHEN 1 THEN '<div class="a">' || text || ' &amp; more &lt;tags&gt;</div>'
      WHEN 2 THEN '<!-- note --><b>' || text ||
                  '</b>&nbsp;end &#39;q&#39; &quot;z&quot;'
      ELSE text
    END"""


def html_strip_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML removal over tag-injected documents: script/style payloads
    dropped wholesale, comments dropped, tags folded to spaces, the common
    entity set unescaped (&amp; strictly last, so '&amp;lt;' stays the
    literal '&lt;'), space runs collapsed — with per-rule counts, rules
    owned by ``operators/textnorm.py`` which also emits the oracle's SQL
    (the PII/unicode discipline). Zero shuffles. The stage that runs
    BEFORE ``unicode_scrub`` on raw crawl text."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", F.expr(f"({_HTML_TEXT})").alias("text"))
    return html_strip(dirty, "text", keep_cols=("doc_id",))


def _html_sql() -> str:
    counts, clean = html_sql_exprs(f"({_HTML_TEXT})")
    cols = ",\n       ".join(counts)
    return f"""
SELECT doc_id,
       {cols},
       {clean} AS clean_text
FROM documents
"""


HTML_STRIP_SQL = _html_sql()


def unicode_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode repair over artifact-injected documents: mojibake fixes,
    zero-width/control strips, space/quote/dash folds, space-run collapse
    — with per-rule counts, each rule counted on the text its
    predecessors already rewrote (``operators/textnorm.py`` owns the
    rules AND emits the oracle's SQL fragments, so pattern/order drift is
    impossible). Zero shuffles — the scrub runs inside the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select("doc_id", F.expr(f"({_NORM_TEXT})").alias("text"))
    return unicode_scrub(dirty, "text", keep_cols=("doc_id",))


def _norm_sql() -> str:
    counts, clean = norm_sql_exprs(f"({_NORM_TEXT})")
    cols = ",\n       ".join(counts)
    return f"""
SELECT doc_id,
       {cols},
       {clean} AS clean_text
FROM documents
"""


UNICODE_SCRUB_SQL = _norm_sql()


SPECS = [
    QuerySpec(
        "domain_quality_gate",
        domain_quality_gate_q,
        DOMAIN_GATE_SQL,
        headline=True,
        doc="per-registrable-domain quality gate: canonical-URL dup rate + "
            "exact-integer quality mean in one domain-keyed shuffle, "
            "broadcast blocklist verdicts",
    ),
    QuerySpec(
        "domain_gate_purge",
        domain_gate_purge_q,
        DOMAIN_PURGE_SQL,
        doc="the domain gate's APPLY step: broadcast semi-join purge of "
            "blocked/dup-farm/low-quality domains; exact-membership oracle",
    ),
    QuerySpec(
        "html_strip",
        html_strip_q,
        HTML_STRIP_SQL,
        doc="HTML removal (script/style/comment drop, tag fold, common "
            "entities with &amp; last) with per-rule counts; operator "
            "emits the oracle's SQL fragments",
    ),
    QuerySpec(
        "unicode_scrub",
        unicode_scrub_q,
        UNICODE_SCRUB_SQL,
        headline=True,
        doc="pre-tokenizer unicode repair (mojibake/zero-width/space/quote "
            "folds, ordered rules) with per-rule counts; operator emits the "
            "oracle's SQL fragments so rules can't drift",
    ),
]
