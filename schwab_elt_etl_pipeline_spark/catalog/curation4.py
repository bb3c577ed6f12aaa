"""Curation wave 4: URL canonicalization dedup, within-document
self-repetition scrub, deterministic training-shard manifest. All
oracle-checked.

Round-10 additions kept deliberately small (verification-bandwidth
discipline): each is a genuinely new pipeline stage — the web-corpus URL
front door ahead of content dedup, the intra-doc repeat excision that
composes with the corpus-level passage dedup, and the write-side shard
manifest a trainer's loader consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.dedup import (
    intradoc_dedup_rebuild,
)
from schwab_elt_etl_pipeline_spark.operators.sharding import (
    shard_manifest,
    shard_of_sql,
)
from schwab_elt_etl_pipeline_spark.operators.urls import url_dup_groups
from schwab_elt_etl_pipeline_spark.sources import load_table

# Deterministic messy-URL synthesis from `documents` (the catalog's media
# convention): four spelling variants of the same logical page — mixed-case
# www host + default port, tracking params in shuffled positions, a
# click-id tracker behind a trailing slash, a fragment. After
# canonicalization, variants collapse onto 'https://<source>.example.com
# /docs/<doc_id % 50>' plus the surviving page param. (The click-id
# variant uses fbclid, a true tracker — generic ?id= is deliberately NOT
# stripped by the operator because real sites key distinct pages on it.)
_URL_EXPR = """
    concat(
      'https://WWW.', source, '.Example.COM:443/docs/', cast(doc_id % 50 as string),
      CASE cast(doc_id % 4 as int)
        WHEN 0 THEN concat('?utm_source=feed&page=', cast(doc_id % 7 as string), '&utm_campaign=x')
        WHEN 1 THEN concat('?page=', cast(doc_id % 7 as string), '&ref=tw')
        WHEN 2 THEN concat('/?fbclid=', cast(doc_id as string))
        ELSE concat('?page=', cast(doc_id % 7 as string), '#sec', cast(doc_id % 3 as string))
      END)"""


def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-exact dup groups after canonicalization: lowercase de-www'd
    host, dropped port/fragment/tracking params, sorted surviving params,
    stripped trailing slash — then ONE groupBy on the canonical string.
    The Spark side exercises the real ``parse_url`` machinery
    (``operators/urls.py``); the oracle reconstructs the canonical form
    algebraically from the synthesis rule, so any canonicalization drift
    (a missed param, a kept fragment, unsorted params) hash-mismatches."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.expr(_URL_EXPR).alias("url"))
    return url_dup_groups(media, "url", "doc_id")


URL_CANON_SQL = """
SELECT 'https://' || source || '.example.com/docs/' || CAST(doc_id % 50 AS VARCHAR)
       || CASE WHEN doc_id % 4 = 2 THEN ''
               ELSE '?page=' || CAST(doc_id % 7 AS VARCHAR) END AS canonical_url,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY 1
"""


def intradoc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-passage excision (the self-repetition
    scrub): first in-doc occurrence of each 20-token passage survives,
    repeats are excised, text rebuilt in position order. No corpus-wide
    key — two doc-keyed shuffles, linear at any scale. Core in
    ``operators/dedup.py intradoc_dedup_rebuild`` (shares
    ``split_passages`` with passage/boilerplate dedup)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return intradoc_dedup_rebuild(docs, passage_tokens=20)


INTRADOC_SQL = r"""
WITH tok AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS ts FROM documents
), p AS (
  SELECT doc_id,
         CAST((start - 1) // 20 AS INT) AS passage_id,
         array_to_string(ts[start : start + 19], ' ') AS passage
  FROM (SELECT doc_id, ts, UNNEST(generate_series(1, LEN(ts), 20)) AS start
        FROM tok)
), firsts AS (
  SELECT doc_id, passage, MIN(passage_id) AS passage_id
  FROM p GROUP BY doc_id, passage
)
SELECT t.doc_id,
       t.n_passages,
       f.n_kept,
       f.deduped_text
FROM (SELECT doc_id, COUNT(*) AS n_passages FROM p GROUP BY doc_id) t
JOIN (SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(passage, ' ' ORDER BY passage_id) AS deduped_text
      FROM firsts GROUP BY doc_id) f USING (doc_id)
"""


def shard_manifest_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8-way training-shard manifest: Knuth-multiplicative
    hash shard assignment, per-shard doc/token totals, exact integer ppm
    shares from an unpartitioned window over the <=8-row aggregate (ONE
    corpus scan — the SinglePartition exchange is bounded by the shard
    count, never the data). Core in ``operators/sharding.py``."""
    docs = load_table(spark, sf_dir, "documents")
    return shard_manifest(docs, shards=8)


SHARD_MANIFEST_SQL = rf"""
WITH per AS (
  SELECT {shard_of_sql("doc_id", 8)} AS shard,
         COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE LEN(string_split_regex(TRIM(text), '\s+')) END) AS BIGINT) AS sum_tokens,
         MIN(doc_id) AS min_doc,
         MAX(doc_id) AS max_doc
  FROM documents
  GROUP BY 1
)
SELECT CAST(shard AS INT) AS shard, n_docs, sum_tokens, min_doc, max_doc,
       CAST((CAST(n_docs AS HUGEINT) * 1000000) // GREATEST(SUM(n_docs) OVER (), 1) AS BIGINT) AS docs_share_ppm,
       CAST((CAST(sum_tokens AS HUGEINT) * 1000000) // GREATEST(SUM(sum_tokens) OVER (), 1) AS BIGINT) AS tokens_share_ppm
FROM per
"""


SPECS = [
    QuerySpec(
        "url_canonicalize_dedup",
        url_canonicalize_dedup,
        URL_CANON_SQL,
        doc="URL canonicalization (parse_url: host/port/fragment/tracking-"
            "param/slash/param-order rules) + exact dup groups; oracle "
            "reconstructs the canonical form algebraically",
    ),
    QuerySpec(
        "intradoc_dedup",
        intradoc_dedup,
        INTRADOC_SQL,
        doc="within-document repeated-passage excision + rebuild (self-"
            "repetition scrub; composes with corpus passage dedup)",
    ),
    QuerySpec(
        "shard_manifest_hash",
        shard_manifest_hash,
        SHARD_MANIFEST_SQL,
        doc="deterministic hash-shard manifest with exact integer ppm "
            "balance shares; one corpus scan",
    ),
]
