"""Curation wave 7 (round 13): PSL registrable domains + the raw-crawl
curation chain composed end-to-end.

Two additions (verification-bandwidth discipline):

- ``psl_registrable_domain`` — the real public-suffix algorithm
  (``operators/psl.py``) over injected messy hosts, oracle EMITTED from
  the same compiled rule groups (the textnorm/pii anti-drift discipline).
- ``web_curation_e2e`` — the full raw-crawl pipeline as ONE hash-pinned
  artifact: html_strip → unicode_scrub → lang-ID gate → Gopher repetition
  gate → URL canonicalize → PSL domain stats/gate/purge → URL-exact
  keep-first → MinHash-LSH near-dup keep-first → per-source sequence
  packing. Every stage exists standalone in the catalog; what was prose
  (the ORDER contracts in textnorm.py / domains.py module docstrings)
  becomes a value-hashed manifest here: reordering any two stages changes
  the surviving membership or the token offsets and the oracle
  mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.curation import repetition_stats
from schwab_elt_etl_pipeline_spark.operators.dedup import (
    minhash_verified_pairs,
)
from schwab_elt_etl_pipeline_spark.operators.domains import (
    apply_domain_gate,
    blocklist_df,
    domain_quality_gate,
    domain_stats,
)
from schwab_elt_etl_pipeline_spark.operators.psl import (
    psl_sql_expr,
    registrable_domain_psl,
)
from schwab_elt_etl_pipeline_spark.operators.sharding import token_count
from schwab_elt_etl_pipeline_spark.operators.text import LANG_MARKERS, lang_id
from schwab_elt_etl_pipeline_spark.operators.textnorm import (
    html_sql_exprs,
    html_strip,
    norm_sql_exprs,
    unicode_scrub,
)
from schwab_elt_etl_pipeline_spark.operators.urls import canonical_url
from schwab_elt_etl_pipeline_spark.sources import load_table

# ---------------------------------------------------------------------------
# psl_registrable_domain
# ---------------------------------------------------------------------------

# Messy-host synthesis exercising every committed rule family: private
# suffixes (github.io), multi-part ccTLD (co.uk), wildcard (*.ck, *.kobe.jp),
# exception (!www.ck), unknown TLD (implicit '*'), and a host that IS a
# public suffix (NULL registrable domain). Dialect-portable expression.
_PSL_HOST = """
    CASE CAST(doc_id % 8 AS INT)
      WHEN 0 THEN 'u' || source || '.github.io'
      WHEN 1 THEN 'deep.u' || source || '.github.io'
      WHEN 2 THEN 'blog.' || source || 'media.co.uk'
      WHEN 3 THEN 'shop.' || source || '.ck'
      WHEN 4 THEN 'www.ck'
      WHEN 5 THEN 'a.city.kobe.jp'
      WHEN 6 THEN source || '.internal'
      ELSE 'github.io'
    END"""


def psl_registrable_domain_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-suffix registrable-domain extraction (expression path) over
    injected hosts covering every rule family in the committed subset.
    Zero shuffles — the whole lookup is scan-stage expression work; the
    oracle CASE/IN chain is EMITTED from the same compiled rule groups so
    list or precedence drift hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    host = F.expr(f"({_PSL_HOST})")
    return docs.select(
        "doc_id",
        host.alias("host"),
        registrable_domain_psl(host).alias("domain"),
    )


PSL_DOMAIN_SQL = f"""
SELECT doc_id,
       ({_PSL_HOST}) AS host,
       {psl_sql_expr(f"({_PSL_HOST})")} AS domain
FROM documents
"""


# ---------------------------------------------------------------------------
# web_curation_e2e
# ---------------------------------------------------------------------------

# Raw-crawl synthesis: HTML/unicode mess on the text, messy URLs whose
# domains exercise the PSL (per-user github.io private suffixes), a
# mirror farm (3 pages recrawled ~N/5 times -> dup_farm), and a blocked ad
# domain. Both expressions are dialect-portable; the oracle reconstructs
# canonical URL and domain ALGEBRAICALLY from the synthesis rule (the
# curation6 discipline — independent of the Spark parse_url machinery).
_ZWSP = "\u200b"  # authored as an escape: transport-safe in both dialects
_RAW_TEXT = f"""
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN '<p>' || text || '</p><script>var q=1;</script>'
      WHEN 1 THEN '<!-- c --><b>' || text || '</b> â€œq â€“ r&nbsp;s'
      ELSE text || '  z{_ZWSP}w  end'
    END"""

_RAW_URL = """
    CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN 'https://WWW.u' || source || '.GitHub.IO:443/p/'
                  || CAST(doc_id % 97 AS STRING) || '?utm_campaign=z'
      WHEN 1 THEN 'https://blog.' || source || 'media.co.uk/a/'
                  || CAST(doc_id % 97 AS STRING) || '#frag'
      WHEN 2 THEN 'https://' || source || 'media.co.uk/a/'
                  || CAST(doc_id % 97 AS STRING) || '/'
      WHEN 3 THEN 'https://CDN.mirrorfarm.ORG:443/m/' || CAST(doc_id % 3 AS STRING)
      ELSE 'https://ads.spamnet.example/x/' || CAST(doc_id AS STRING)
    END"""

_E2E_BLOCKLIST = [("spamnet.example", "ad network"), ("absent.example", "unused")]
_E2E_Q_SCALE = 400
_E2E_MIN_DOCS = 3
_E2E_MAX_DUP = 0.5
_E2E_MIN_QUALITY = 0.05
_E2E_TAU = 0.5
_E2E_SEQ = 256
_E2E_KEEP = ("keep", "small")  # C4-style: small domains route to doc gates


def web_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE raw-crawl curation chain as one oracle-checked query
    (every stage exists standalone; this pins their ORDER):

    1. ``html_strip`` then 2. ``unicode_scrub`` (markup before mojibake —
       the textnorm module-docstring contract);
    3. lang-ID gate (keep predicted 'en') and 4. Gopher repetition gate,
       both scored on the CLEANED text;
    5. ``canonical_url`` + PSL ``registrable_domain`` (broadcast-free
       expression kernels);
    6. domain stats → quality gate → purge over the gate survivors
       (dup_rate measured BEFORE URL-exact dedup, or a mirror farm would
       hide its own evidence);
    7. URL-exact keep-first (lowest doc_id per canonical page);
    8. MinHash-LSH near-dup keep-first (exact-Jaccard verified, so the
       oracle's brute force certifies LSH recall through the whole chain);
    9. per-source concatenate-and-chunk sequence packing.

    Output: the training manifest (doc_id, source, domain, n_tok,
    tok_offset, seq_first, seq_last) — exact membership + offsets, so a
    reorder of ANY two stages hash-mismatches.

    Plan shape at scale: two map-only regex cascades, token-grain
    aggregations per doc, ONE domain-keyed shuffle + broadcast blocklist
    + broadcast purge semi-join, one canonical-URL window, the banded-LSH
    bucket join (never all-pairs), and one per-source cumsum window — no
    global ordering, no cartesian, nothing quadratic."""
    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        "source",
        F.expr(f"({_RAW_TEXT})").alias("text"),
        F.expr(f"({_RAW_URL})").alias("url"),
    )
    stripped = html_strip(raw, "text", keep_cols=("doc_id", "source", "url"))
    cleaned = unicode_scrub(
        stripped.select(
            "doc_id", "source", "url", F.col("clean_text").alias("text")
        ),
        "text",
        keep_cols=("doc_id", "source", "url"),
    ).select(
        "doc_id", "source", "url", F.col("clean_text").alias("text")
    ).localCheckpoint(eager=False)
    # ^ the materialization boundary is load-bearing: every downstream
    # stage (lang counts, token explode, shingles, q_weight) references
    # `text`, and CollapseProject would otherwise re-inline the ~30-rule
    # regex cascade into EACH reference — measured 270 s -> seconds at
    # sf0.001 (the curation6 _dom_enriched lesson, an order of magnitude
    # bigger tree here).

    rep = repetition_stats(cleaned, "text", "doc_id").select(
        "doc_id", "repetitive"
    )
    gated = (
        cleaned.withColumn("pred_lang", lang_id("text"))
        .join(rep, "doc_id")
        .where((F.col("pred_lang") == "en") & (F.col("repetitive") == 0))
    )

    enriched = gated.select(
        "doc_id",
        "source",
        "text",
        canonical_url("url").alias("canonical_url"),
        F.least(F.length("text"), F.lit(_E2E_Q_SCALE)).alias("q_weight"),
    ).select(
        "*",
        registrable_domain_psl(
            F.try_parse_url(F.col("canonical_url"), F.lit("HOST"))
        ).alias("domain"),
    ).localCheckpoint(eager=False)
    # ^ second load-bearing boundary (measured r13-opt: dom_kept leg 5.75 s
    # -> 4.20 s at sf0.1): (a) `enriched` feeds BOTH the domain-stats
    # broadcast side and the purge corpus side — without the pin the
    # gate join + URL/PSL projection compute twice; (b) CollapseProject
    # would inline the canonical_url regex chain into every slice of the
    # PSL CASE chain (the lone-`text` lesson above, URL flavored).
    stats = domain_stats(enriched, quality_scale=_E2E_Q_SCALE)
    verdicts = domain_quality_gate(
        stats,
        blocklist_df(spark, _E2E_BLOCKLIST),
        min_docs=_E2E_MIN_DOCS,
        max_dup_rate=_E2E_MAX_DUP,
        min_quality=_E2E_MIN_QUALITY,
    )
    dom_kept = apply_domain_gate(enriched, verdicts, keep=_E2E_KEEP)

    w_url = Window.partitionBy("canonical_url").orderBy("doc_id")
    url_kept = (
        dom_kept.withColumn("_rk", F.row_number().over(w_url))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .localCheckpoint(eager=False)  # referenced by pairs AND the anti-join
    )

    pairs = minhash_verified_pairs(
        url_kept.select("doc_id", "text"), ngram=2, k=32, bands=16, tau=_E2E_TAU
    )
    drops = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    final = url_kept.join(drops, "doc_id", "left_anti").select(
        "doc_id", "source", "domain", token_count("text").alias("n_tok")
    )

    w_pack = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = final.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tok").over(w_pack), F.lit(0)).cast("long")
    )
    return packed.select(
        "doc_id",
        "source",
        "domain",
        F.col("n_tok").cast("long").alias("n_tok"),
        "tok_offset",
        F.expr(f"tok_offset DIV {_E2E_SEQ}").alias("seq_first"),
        F.expr(f"(tok_offset + n_tok - 1) DIV {_E2E_SEQ}").alias("seq_last"),
    )


def _e2e_sql() -> str:
    _, html_clean = html_sql_exprs(f"({_RAW_TEXT})")
    _, full_clean = norm_sql_exprs(f"({html_clean})")

    langs = list(LANG_MARKERS)
    count = {
        l: f"LEN(regexp_extract_all(text, '{re}'))"
        for l, re in LANG_MARKERS.items()
    }
    lang_expr = f"'{langs[-1]}'"
    for lang in reversed(langs[:-1]):
        others = ", ".join(count[o] for o in langs if o != lang)
        lang_expr = (
            f"CASE WHEN {count[lang]} >= GREATEST({others}) "
            f"THEN '{lang}' ELSE {lang_expr} END"
        )

    toks = r"string_split_regex(TRIM(LOWER(text)), '\s+')"
    grams2 = (
        "list_distinct(list_transform("
        "generate_series(1, GREATEST(LEN(ts) - 1, 0)), i -> ts[i] || ' ' || ts[i+1]))"
    )
    n_tok = (
        r"CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 "
        r"ELSE LEN(string_split_regex(TRIM(text), '\s+')) END"
    )
    blocks = ", ".join(f"('{d}', '{r}')" for d, r in _E2E_BLOCKLIST)
    keeps = ", ".join(f"'{k}'" for k in _E2E_KEEP)
    return f"""
WITH clean AS MATERIALIZED (
  SELECT doc_id, source, ({full_clean}) AS text FROM documents
), lang AS (
  SELECT doc_id, ({lang_expr}) AS pred_lang FROM clean
), tok AS (
  SELECT doc_id, {toks} AS ts FROM clean
), per_token AS (
  SELECT doc_id, t.token, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(ts) AS token FROM tok) t
  GROUP BY doc_id, t.token
), rstats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(MAX(c) AS BIGINT) AS top_c
  FROM per_token GROUP BY doc_id
), rgrams AS (
  SELECT doc_id, LEN({grams2}) AS d2 FROM tok
), rep AS (
  SELECT s.doc_id,
         CAST(s.top_c / s.n_tokens > 0.2 OR
              (CASE WHEN s.n_tokens > 1
                    THEN 1.0 - g.d2 / (s.n_tokens - 1) ELSE 0.0 END) > 0.3
              AS INT) AS repetitive
  FROM rstats s JOIN rgrams g USING (doc_id)
), gated AS (
  SELECT c.doc_id, c.source, c.text
  FROM clean c JOIN lang USING (doc_id) JOIN rep USING (doc_id)
  WHERE lang.pred_lang = 'en' AND rep.repetitive = 0
), urld AS MATERIALIZED (
  SELECT g.doc_id, g.source, g.text,
         CASE CAST(g.doc_id % 5 AS INT)
           WHEN 0 THEN 'https://u' || g.source || '.github.io/p/'
                       || CAST(g.doc_id % 97 AS STRING)
           WHEN 1 THEN 'https://blog.' || g.source || 'media.co.uk/a/'
                       || CAST(g.doc_id % 97 AS STRING)
           WHEN 2 THEN 'https://' || g.source || 'media.co.uk/a/'
                       || CAST(g.doc_id % 97 AS STRING)
           WHEN 3 THEN 'https://cdn.mirrorfarm.org/m/' || CAST(g.doc_id % 3 AS STRING)
           ELSE 'https://ads.spamnet.example/x/' || CAST(g.doc_id AS STRING)
         END AS canonical_url,
         CASE CAST(g.doc_id % 5 AS INT)
           WHEN 0 THEN 'u' || g.source || '.github.io'
           WHEN 1 THEN g.source || 'media.co.uk'
           WHEN 2 THEN g.source || 'media.co.uk'
           WHEN 3 THEN 'mirrorfarm.org'
           ELSE 'spamnet.example'
         END AS domain,
         LEAST(LENGTH(g.text), {_E2E_Q_SCALE}) AS w
  FROM gated g
), dstats AS (
  SELECT domain,
         COUNT(*) AS n_docs,
         COUNT(DISTINCT canonical_url) AS n_pages,
         CAST(COUNT(*) - COUNT(DISTINCT canonical_url) AS DOUBLE) / COUNT(*)
           AS dup_rate,
         CAST(SUM(w) AS DOUBLE) / ({_E2E_Q_SCALE} * COUNT(*)) AS mean_quality
  FROM urld GROUP BY domain
), gate AS (
  SELECT s.domain,
         CASE WHEN b.domain IS NOT NULL THEN 'blocked'
              WHEN s.n_docs < {_E2E_MIN_DOCS} THEN 'small'
              WHEN s.dup_rate > {_E2E_MAX_DUP} THEN 'dup_farm'
              WHEN s.mean_quality < {_E2E_MIN_QUALITY} THEN 'low_quality'
              ELSE 'keep' END AS verdict
  FROM dstats s LEFT JOIN (VALUES {blocks}) b(domain, reason)
       ON s.domain = b.domain
), domkept AS (
  SELECT u.* FROM urld u JOIN gate USING (domain)
  WHERE gate.verdict IN ({keeps})
), urlkept AS MATERIALIZED (
  SELECT doc_id, source, domain, text
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY canonical_url
                                     ORDER BY doc_id) AS rk
        FROM domkept)
  WHERE rk = 1
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(LEN({toks}) - 1, 0)),
           i -> {toks}[i] || ' ' || {toks}[i+1])) AS grams
  FROM urlkept
), drops AS (
  SELECT DISTINCT b.doc_id
  FROM sh a JOIN sh b ON b.doc_id > a.doc_id
  WHERE ROUND(LEN(list_intersect(a.grams, b.grams)) /
              LEN(list_distinct(list_concat(a.grams, b.grams))), 6) >= {_E2E_TAU}
), final AS (
  SELECT u.doc_id, u.source, u.domain, ({n_tok}) AS n_tok
  FROM urlkept u LEFT JOIN drops d ON u.doc_id = d.doc_id
  WHERE d.doc_id IS NULL
)
SELECT doc_id, source, domain,
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS tok_offset,
       CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {_E2E_SEQ}
         AS BIGINT) AS seq_first,
       CAST((COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n_tok - 1)
         // {_E2E_SEQ} AS BIGINT) AS seq_last
FROM final
"""


WEB_CURATION_SQL = _e2e_sql()


SPECS = [
    QuerySpec(
        "psl_registrable_domain",
        psl_registrable_domain_q,
        PSL_DOMAIN_SQL,
        doc="public-suffix registrable domains (wildcard/exception/private "
            "rules) as scan-stage expression work; oracle emitted from the "
            "same compiled rule groups",
    ),
    QuerySpec(
        "web_curation_e2e",
        web_curation_e2e,
        WEB_CURATION_SQL,
        headline=True,
        doc="FULL raw-crawl chain: html_strip -> unicode_scrub -> lang + "
            "Gopher gates -> canonical URL + PSL domain gate/purge -> "
            "URL-exact + MinHash near-dup keep-first -> sequence packing; "
            "exact-membership manifest oracle",
    ),
]
