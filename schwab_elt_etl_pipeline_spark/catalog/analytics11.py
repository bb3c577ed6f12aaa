"""Round-7 corpus-statistics wave: collocation mining, novelty scoring, and
leakage-safe dataset splitting — three ops between "deduped corpus" and
"training mixture" that every large-scale data pipeline runs.

``phrase_detection_pmi`` is the word2vec phrase-merging statistic (Mikolov
et al. 2013: score = (count(ab) - delta) * N / (count(a) * count(b)));
``ngram_novelty`` scores each document by how much of it appears nowhere
else in the corpus (the inverse of boilerplate); ``leakage_safe_split``
assigns train/valid/test by NEAR-DUP CLUSTER, not by document — the split
hygiene step that keeps eval members' near-duplicates out of train (see
Lee et al. 2022 on dedup-test leakage). All three are native-expression
plans over the ``documents`` table with full DuckDB oracles; the split
oracle re-runs the connected-components recursive CTE, so the hash match
certifies cluster-consistency of the assignment end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.catalog.llm_text import (
    _CLUSTERS_FINAL,
    DEDUP_CLUSTERS_SQL,
    ngram_jaccard_pairs,
)
from schwab_elt_etl_pipeline_spark.operators.dedup import connected_components
from schwab_elt_etl_pipeline_spark.sources import load_table

_TOKS = r"string_split_regex(TRIM(LOWER(text)), '\s+')"
_PMI_DELTA = 5  # Mikolov discount: kills phrases rarer than delta
_PMI_MIN_COUNT = 5


def phrase_detection_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 adjacent-word collocations by the word2vec phrase score
    ``(pair_cnt - delta) * N / (cnt(lhs) * cnt(rhs))``. Three map-side
    combinable aggregations (unigrams, total, pairs) and two word-keyed
    joins of the pair table against the unigram table — at 100 TB the
    unigram table is vocabulary-sized, so the joins shuffle vocabulary
    rows, never the corpus. The token total rides a broadcast 1-row
    crossJoin (sanctioned scalar pattern). Ties break on the pair text so
    the top-k set is deterministic."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = uni.agg(F.sum("cnt").alias("n_tokens"))
    pair_expr = F.when(
        F.size(F.col("_toks")) < 2,
        F.array().cast("array<struct<lhs:string,rhs:string>>"),
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(_toks) - 1),"
            " i -> struct(_toks[i-1] AS lhs, _toks[i] AS rhs))"
        )
    )
    # materialize before exploding: Generate over a lambda-built array
    # re-evaluates the interpreted lambda per element (bpe_pair_stats)
    mat = (
        docs.withColumn("_toks", toks)
        .select(pair_expr.alias("pairs"))
        .localCheckpoint(eager=False)
    )
    pairs = (
        mat.select(F.explode("pairs").alias("p"))
        .select("p.lhs", "p.rhs")
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= _PMI_MIN_COUNT)
    )
    la = uni.select(F.col("tok").alias("lhs"), F.col("cnt").alias("_ca"))
    rb = uni.select(F.col("tok").alias("rhs"), F.col("cnt").alias("_cb"))
    scored = (
        pairs.join(la, "lhs")
        .join(rb, "rhs")
        .crossJoin(F.broadcast(total))
        .select(
            "lhs",
            "rhs",
            "pair_cnt",
            F.round(
                (
                    (F.col("pair_cnt") - float(_PMI_DELTA))
                    * F.col("n_tokens").cast("double")
                )
                / (F.col("_ca").cast("double") * F.col("_cb").cast("double")),
                6,
            ).alias("score"),
        )
    )
    return scored.orderBy(
        F.desc("score"), F.asc("lhs"), F.asc("rhs")
    ).limit(100)


PHRASE_PMI_SQL = rf"""
WITH tok AS (
  SELECT UNNEST({_TOKS}) AS tok FROM documents
), uni AS (
  SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok
), total AS (
  SELECT SUM(cnt) AS n_tokens FROM uni
), tl AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), pairs AS (
  SELECT UNNEST(list_transform(
           generate_series(1, GREATEST(LEN(ts) - 1, 0)),
           i -> struct_pack(lhs := ts[i], rhs := ts[i+1]))) AS p
  FROM tl
), pc AS (
  SELECT p.lhs AS lhs, p.rhs AS rhs, COUNT(*) AS pair_cnt
  FROM pairs GROUP BY p.lhs, p.rhs
  HAVING COUNT(*) >= {_PMI_MIN_COUNT}
)
SELECT pc.lhs, pc.rhs, pc.pair_cnt,
       ROUND(((pc.pair_cnt - {_PMI_DELTA}.0) * CAST(t.n_tokens AS DOUBLE))
             / (CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)), 6) AS score
FROM pc
JOIN uni a ON a.tok = pc.lhs
JOIN uni b ON b.tok = pc.rhs
CROSS JOIN total t
ORDER BY score DESC, lhs ASC, rhs ASC
LIMIT 100
"""


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of its DISTINCT word 3-grams that
    occur in no other document. High-novelty docs carry unique content;
    low-novelty ones are templated/boilerplate — the cheap relational
    stand-in for contribution scoring when ranking what to keep. One
    per-doc distinct explode, one gram-keyed doc-frequency count, one
    gram-keyed join back — all map-side combinable; gram text shuffles
    once. Docs with fewer than 3 tokens have no 3-grams and emit no row
    (matching the SQL UNNEST semantics)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams_expr = F.when(
        F.size(F.col("_toks")) < 3, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(_toks) - 2),"
            " i -> concat(_toks[i-1], ' ', _toks[i], ' ', _toks[i+1]))"
        )
    )
    mat = (
        docs.withColumn("_toks", toks)
        .select("doc_id", F.array_distinct(grams_expr).alias("grams"))
        .localCheckpoint(eager=False)
    )
    dg = mat.select("doc_id", F.explode("grams").alias("gram"))
    dfreq = dg.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
    return (
        dg.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("_df") == 1, 1)).alias("n_unique"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_unique",
            F.round(
                F.col("n_unique").cast("double") / F.col("n_grams"), 6
            ).alias("novelty"),
        )
    )


NGRAM_NOVELTY_SQL = rf"""
WITH tl AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, UNNEST(list_transform(
             generate_series(1, GREATEST(LEN(ts) - 2, 0)),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gram
    FROM tl)
), dfreq AS (
  SELECT gram, COUNT(*) AS df FROM dg GROUP BY gram
)
SELECT dg.doc_id,
       COUNT(*) AS n_grams,
       COUNT(*) FILTER (WHERE f.df = 1) AS n_unique,
       ROUND(CAST(COUNT(*) FILTER (WHERE f.df = 1) AS DOUBLE) / COUNT(*), 6)
         AS novelty
FROM dg JOIN dfreq f ON dg.gram = f.gram
GROUP BY dg.doc_id
"""


def first_seen_novelty_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document FIRST-OCCURRENCE novelty (the prefix-ordered sibling of
    ``ngram_novelty``): the fraction of a doc's distinct 3-grams whose
    corpus-wide minimum doc_id is this doc — content the document
    *introduced* in arrival order. This is the batch contract for the
    incremental streaming gram index (``streaming/corpus.py
    update_gram_index``): draining the corpus in ascending doc_id order
    through the index reproduces these rows exactly, so the driver hash
    match certifies the streaming twin's target semantics too. The engine
    side runs on 8-byte ``xxhash64`` gram fingerprints (gram text shuffles
    once at tokenize time, never again); the oracle recomputes on gram text
    — the hash match doubles as a fingerprint-collision canary."""
    from schwab_elt_etl_pipeline_spark.operators.text import first_seen_novelty

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return first_seen_novelty(docs, n=3)


FIRST_SEEN_NOVELTY_SQL = rf"""
WITH tl AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), dg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, UNNEST(list_transform(
             generate_series(1, GREATEST(LEN(ts) - 2, 0)),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS gram
    FROM tl)
), firsts AS (
  SELECT gram, MIN(doc_id) AS first_doc FROM dg GROUP BY gram
)
SELECT dg.doc_id,
       COUNT(*) AS n_grams,
       COUNT(*) FILTER (WHERE f.first_doc = dg.doc_id) AS n_new,
       ROUND(CAST(COUNT(*) FILTER (WHERE f.first_doc = dg.doc_id) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM dg JOIN firsts f ON dg.gram = f.gram
GROUP BY dg.doc_id
"""


_SPLIT_TAU = 0.05  # same threshold as neardup_canonicalize: real clusters


def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/valid/test assignment by NEAR-DUP CLUSTER: Jaccard pairs
    (jac >= 0.05) -> connected components -> every document labeled with
    its cluster's canonical id -> deterministic hash of the CLUSTER id
    picks the split (8/1/1). Two near-duplicate documents can therefore
    never straddle train and test — the leakage guarantee document-hash
    splits silently violate. The hash is the same integer-arithmetic draw
    as ``corpus_temperature_mix`` (engine-portable, no RNG); the oracle
    re-runs the components as a recursive CTE, so the driver hash match
    certifies cluster-consistency of every assignment."""
    pairs = ngram_jaccard_pairs(spark, sf_dir).filter(F.col("jac") >= _SPLIT_TAU)
    comp = connected_components(pairs, src="a_id", dst="b_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labeled = docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id", F.coalesce("comp", F.col("doc_id")).alias("component")
    )
    bucket = (
        ((F.col("component") % 1000003) * 2654435761) % 999983 % 10
    ).cast("int")
    return labeled.select(
        "doc_id",
        "component",
        bucket.alias("bucket"),
        F.when(bucket <= 7, "train")
        .when(bucket == 8, "valid")
        .otherwise("test")
        .alias("split"),
    )


LEAKAGE_SPLIT_SQL = (
    DEDUP_CLUSTERS_SQL.replace(">= 0.3", f">= {_SPLIT_TAU}").replace(
        _CLUSTERS_FINAL, ""
    )
    + f""", comp AS (
  {_CLUSTERS_FINAL}), assigned AS (
  SELECT doc_id, component,
         CAST(((component % 1000003) * 2654435761) % 999983 % 10 AS INT)
           AS bucket
  FROM comp
)
SELECT doc_id, component, bucket,
       CASE WHEN bucket <= 7 THEN 'train'
            WHEN bucket = 8 THEN 'valid'
            ELSE 'test' END AS split
FROM assigned
"""
)


SPECS = [
    QuerySpec(
        "phrase_detection_pmi", phrase_detection_pmi, PHRASE_PMI_SQL,
        doc="word2vec collocation mining: discounted PMI over adjacent "
            "pairs, vocabulary-sized joins only",
    ),
    QuerySpec(
        "ngram_novelty", ngram_novelty, NGRAM_NOVELTY_SQL,
        doc="per-doc novelty: fraction of distinct 3-grams unique to the doc",
    ),
    QuerySpec(
        "first_seen_novelty", first_seen_novelty_q, FIRST_SEEN_NOVELTY_SQL,
        doc="prefix-ordered novelty: fraction of distinct 3-grams this doc "
            "introduced (min-doc_id claim) — batch contract of the "
            "streaming gram index",
    ),
    QuerySpec(
        "leakage_safe_split", leakage_safe_split, LEAKAGE_SPLIT_SQL,
        doc="train/valid/test by near-dup cluster — split hygiene against "
            "dedup-test leakage; recursive-CTE-certified",
    ),
]
