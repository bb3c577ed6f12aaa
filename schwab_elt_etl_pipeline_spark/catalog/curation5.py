"""Curation wave 5: PII scrub, SemDeDup semantic pruning, deterministic
mixture-rate sampling. All oracle-checked.

Round-11 additions (verification-bandwidth discipline, ≤3 new queries):
the redaction stage between boilerplate scrub and dedup, the embedding-
space near-dup pruner lexical passes can't replicate, and the
mixture-APPLY primitive that enforces the per-source weights DoReMi-style
reweighting computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.pii import (
    pii_count_sql_exprs,
    pii_scrub,
)
from schwab_elt_etl_pipeline_spark.operators.semdedup import semdedup_prune
from schwab_elt_etl_pipeline_spark.operators.sharding import (
    keep_ppm,
    keep_ppm_sql,
)
from schwab_elt_etl_pipeline_spark.sources import load_table, spread_scan

# Deterministic PII injection into `documents` (the catalog's messy-input
# convention, like curation4's _URL_EXPR): every doc gains an email; docs
# cycle through a dotted phone, an IPv4, a card, or nothing. One dialect-
# portable expression string (||, CASE, CAST AS STRING run identically in
# Spark SQL and DuckDB) so the two sides CANNOT drift on the input.
_PII_TEXT = """
    text || ' contact user' || CAST(doc_id % 97 AS STRING)
         || '@mail' || CAST(doc_id % 7 AS STRING) || '.example.org'
         || CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN ' call ' || CAST(100 + doc_id % 900 AS STRING)
                          || '.555.' || CAST(1000 + doc_id % 9000 AS STRING)
              WHEN 1 THEN ' from 10.' || CAST(doc_id % 256 AS STRING)
                          || '.0.' || CAST(doc_id % 250 AS STRING)
              WHEN 2 THEN ' card 4111-1111-1111-'
                          || CAST(1000 + doc_id % 9000 AS STRING)
              ELSE ''
            END"""


def pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with per-class counts over PII-injected documents:
    email → card → IPv4 → phone, each class counted on the text already
    scrubbed by the classes before it (``operators/pii.py`` owns the rules
    AND emits the oracle's SQL fragments, so pattern/order drift is
    impossible). Zero shuffles — the scrub runs inside the scan stage."""
    docs = load_table(spark, sf_dir, "documents")
    pii = docs.select("doc_id", F.expr(_PII_TEXT).alias("text"))
    return pii_scrub(pii, "text", keep_cols=("doc_id",))


def _pii_sql() -> str:
    counts, scrubbed = pii_count_sql_exprs(f"({_PII_TEXT})")
    cols = ",\n       ".join(counts)
    return f"""
SELECT doc_id,
       {cols},
       {scrubbed} AS scrubbed_text
FROM documents
"""


PII_SCRUB_SQL = _pii_sql()


_SEM_K = 8
_SEM_TAU = 0.35
_SEM_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def semdedup_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over `embeddings`: fixed-seed cell assignment (broadcast
    E-step, corpus stays put) + within-cell keep-first-by-id cosine prune
    (ONE cell-keyed equi-join — pair work is Σ|cell|², never all-pairs).
    τ=0.35 sits in the synthetic embeddings' observed tail (real corpora
    run ~0.95); the oracle replays assignment AND prune exactly, so the
    hash certifies both."""
    # spread the single-row-group scan so the E-step fold and the
    # within-cell pair stage run on every core (no-op on real inputs)
    emb = spread_scan(load_table(spark, sf_dir, "embeddings"))
    return semdedup_prune(emb, k=_SEM_K, tau=_SEM_TAU)


SEMDEDUP_SQL = f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), c0 AS (
  -- zero-norm seeds excluded, mirroring operators/semdedup.py
  -- seed_centroids: a directionless seed sorts differently in the two
  -- engines (NULL-last vs NaN-first) so it must never be a centroid
  SELECT CAST(vec_id AS INT) AS cent_id, v AS c_vec FROM q
  WHERE vec_id < {_SEM_K} AND list_dot_product(v, v) > 0
), s AS MATERIALIZED (
  SELECT q.vec_id, q.v, c.cent_id AS cluster,
         ROUND({_SEM_COS.format(a="q.v", b="c.c_vec")}, 6) AS cos
  FROM q, c0 c
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q.vec_id
                             ORDER BY cos DESC, c.cent_id ASC) = 1
), p AS (
  -- zero-norm guard mirrors operators/semdedup.py keep_first_dups:
  -- directionless vectors are keepers and never evidence
  SELECT a.vec_id, MIN(b.vec_id) AS dup_of
  FROM s a JOIN s b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
  WHERE list_dot_product(a.v, a.v) > 0 AND list_dot_product(b.v, b.v) > 0
    AND ROUND({_SEM_COS.format(a="a.v", b="b.v")}, 6) >= {_SEM_TAU}
  GROUP BY a.vec_id
)
SELECT s.vec_id, s.cluster,
       CASE WHEN p.dup_of IS NULL THEN 0 ELSE 1 END AS is_dup,
       COALESCE(p.dup_of, -1) AS dup_of
FROM s LEFT JOIN p USING (vec_id)
"""


# per-source target rates: deterministic ppm from the source number so the
# mixture is varied but reconstructible in both dialects (src7 → 7)
_RATE_PPM = "CAST(((CAST(substr(source, 4) AS INT) * 37) % 90 + 5) * 10000 AS INT)"
_SAMPLE_SALT = 101


def mixture_sample_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture enforcement: deterministic ppm Bernoulli per document
    against its source's target rate (``keep_ppm`` — Knuth mix in
    DECIMAL(38,0), coordination-free, idempotent, salted so sampling
    decorrelates from shard assignment). Returns the KEPT membership
    (doc_id, source, rate_ppm) so the hash certifies the exact sample, not
    just its size. Zero shuffles; linear at any corpus size.

    Upgrades ``corpus_mix_sample`` (llm_text.py, r7): that query certifies
    the mixing REPORT (per-source counts) on a mod-1000 truncated hash
    with literal fractions; this one certifies exact membership at ppm
    resolution with the exact-decimal shard-hash family and a salt, so
    independent sampling stages can't correlate with each other or with
    shard assignment."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "source", F.expr(_RATE_PPM).alias("rate_ppm")
    ).where(keep_ppm("doc_id", F.col("rate_ppm"), salt=_SAMPLE_SALT))


MIXTURE_SAMPLE_SQL = f"""
SELECT doc_id, source, {_RATE_PPM} AS rate_ppm
FROM documents
WHERE {keep_ppm_sql("doc_id", _RATE_PPM, salt=_SAMPLE_SALT)}
"""


SPECS = [
    QuerySpec(
        "pii_scrub",
        pii_scrub_q,
        PII_SCRUB_SQL,
        headline=True,
        doc="regex-native PII redaction (email/card/IPv4/phone, ordered "
            "classes) with per-class counts; operator emits the oracle's "
            "SQL fragments so rules can't drift",
    ),
    QuerySpec(
        "semdedup_prune",
        semdedup_prune_q,
        SEMDEDUP_SQL,
        headline=True,
        doc="SemDeDup: fixed-seed embedding cells + within-cell "
            "keep-first cosine prune; cell-keyed equi-join, never "
            "all-pairs",
    ),
    QuerySpec(
        "mixture_sample_ppm",
        mixture_sample_ppm,
        MIXTURE_SAMPLE_SQL,
        doc="deterministic per-source ppm mixture sampling (Knuth-mix "
            "Bernoulli, salted; the mixture-APPLY to DoReMi's weights); "
            "exact-membership oracle",
    ),
]
