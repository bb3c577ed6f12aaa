"""LLM-training-data pipeline queries: text analysis + deduplication over the
``documents`` table (BASELINE.json north-star: first-class at 100 TB).

MinHash-LSH and SimHash signatures (xxhash64-based) have no SQL equivalent,
but their VERDICTS do: both run as candidate-generation → exact-Jaccard
verification, so the emitted pair set equals brute-force all-pairs exact
Jaccard — which DuckDB can compute. A hash match therefore certifies
end-to-end LSH recall on the data, not just "the query ran".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.dedup import (
    connected_components,
    exact_dup_groups,
    jaccard,
    minhash_verified_pairs,
    simhash_verified_pairs,
    with_shingles,
)
from schwab_elt_etl_pipeline_spark.operators.text import (
    BPE_TOKEN_RE,
    LANG_MARKERS,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    punct_ratio,
    token_count,
)
from schwab_elt_etl_pipeline_spark.sources import load_table

# DuckDB needs the 'g' flag for global regexp_replace; Spark is global by default.
_FP_SQL = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by normalized-text fingerprint (hash groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dup_groups(docs)


DEDUP_EXACT_SQL = f"""
SELECT {_FP_SQL} AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score components: token counts, punctuation ratio, English
    stopword ratio — all single deterministic divisions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
        punct_ratio("text").alias("punct_ratio"),
        (F.regexp_count(F.col("text"), F.lit(LANG_MARKERS["en"])) / token_count("text")).alias(
            "en_stop_ratio"
        ),
    )


TEXT_QUALITY_SQL = rf"""
SELECT doc_id,
       LENGTH(text) AS n_chars_actual,
       LEN(string_split_regex(TRIM(text), '\s+')) AS ws_tokens,
       LEN(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS bpe_tokens,
       LEN(regexp_extract_all(text, '[^\w\s]')) / LENGTH(text) AS punct_ratio,
       LEN(regexp_extract_all(text, '{LANG_MARKERS["en"]}')) / LEN(string_split_regex(TRIM(text), '\s+')) AS en_stop_ratio
FROM documents
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID with deterministic tie-break cascade."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        lang_id("text").alias("pred_lang"),
        (lang_id("text") == F.col("lang")).cast("int").alias("is_correct"),
    )


def _lang_id_sql_expr() -> str:
    langs = list(LANG_MARKERS)
    count = {l: f"LEN(regexp_extract_all(text, '{re}'))" for l, re in LANG_MARKERS.items()}
    expr = f"'{langs[-1]}'"
    for lang in reversed(langs[:-1]):
        others = ", ".join(count[o] for o in langs if o != lang)
        expr = f"CASE WHEN {count[lang]} >= GREATEST({others}) THEN '{lang}' ELSE {expr} END"
    return expr


LANG_ID_SQL = f"""
SELECT doc_id, lang,
       {_lang_id_sql_expr()} AS pred_lang,
       CAST({_lang_id_sql_expr()} = lang AS INT) AS is_correct
FROM documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: canonical md5 over normalized text."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id, {_FP_SQL} AS fp FROM documents
"""


_BAND = 50


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs, banded to (same source,
    0 < doc_id delta ≤ 50).

    The band predicate is turned into an equi-join key: ids bucket by the band
    width, the left side probes its own and the next bucket, so the join never
    materializes the per-source cross product (at 100 TB a source-only key
    would be quadratic; bucketed candidates stay linear in the band width).
    """
    # repartition BEFORE shingling: the source is one small file (1 scan
    # task), and shingle construction is the per-row-heavy step — spread it
    # across the cluster first, then compute.
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sh = with_shingles(docs, "text", 2).select("doc_id", "source", "grams")
    a = sh.select(
        F.col("doc_id").alias("a_id"),
        "source",
        F.col("grams").alias("a_grams"),
        F.explode(
            F.array(
                F.floor(F.col("doc_id") / _BAND), F.floor(F.col("doc_id") / _BAND) + 1
            )
        ).alias("bucket"),
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"),
        "source",
        F.col("grams").alias("b_grams"),
        F.floor(F.col("doc_id") / _BAND).alias("bucket"),
    )
    return (
        a.join(b, on=["source", "bucket"])
        .filter(
            (F.col("b_id") > F.col("a_id")) & (F.col("b_id") - F.col("a_id") <= _BAND)
        )
        .select(
            "source",
            "a_id",
            "b_id",
            F.round(jaccard(F.col("a_grams"), F.col("b_grams")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= 0.05)
    )


NGRAM_JACCARD_SQL = r"""
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, GREATEST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) - 1, 0)),
           i -> string_split_regex(TRIM(LOWER(text)), '\s+')[i] || ' ' ||
                string_split_regex(TRIM(LOWER(text)), '\s+')[i+1])) AS grams
  FROM documents
)
SELECT a.source, a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(LEN(list_intersect(a.grams, b.grams)) /
             LEN(list_distinct(list_concat(a.grams, b.grams))), 6) AS jac
FROM sh a JOIN sh b
  ON a.source = b.source AND b.doc_id > a.doc_id AND b.doc_id - a.doc_id <= 50
WHERE ROUND(LEN(list_intersect(a.grams, b.grams)) /
            LEN(list_distinct(list_concat(a.grams, b.grams))), 6) >= 0.05
"""


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment for the whole corpus: Jaccard pairs
    (jac ≥ 0.3) → connected components → every document labeled with its
    cluster's minimum doc_id (singletons label themselves). The canonical-doc
    selection step of a dedup pass — pairs alone under-delete transitive
    chains (A~B, B~C keeps both A and C).

    At this conservative threshold the synthetic corpus yields singletons
    only (the oracle still certifies the full plumbing); the MULTI-document
    clustering path is exercised on real groups by ``neardup_canonicalize``
    (τ=0.05) and on adversarial graphs by test_connected_components."""
    pairs = ngram_jaccard_pairs(spark, sf_dir).filter(F.col("jac") >= 0.3)
    comp = connected_components(pairs, src="a_id", dst="b_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(comp, docs.doc_id == comp.node, "left").select(
        "doc_id", F.coalesce("comp", F.col("doc_id")).alias("component")
    )


DEDUP_CLUSTERS_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, GREATEST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) - 1, 0)),
           i -> string_split_regex(TRIM(LOWER(text)), '\s+')[i] || ' ' ||
                string_split_regex(TRIM(LOWER(text)), '\s+')[i+1])) AS grams
  FROM documents
), pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b
    ON a.source = b.source AND b.doc_id > a.doc_id AND b.doc_id - a.doc_id <= 50
  WHERE ROUND(LEN(list_intersect(a.grams, b.grams)) /
              LEN(list_distinct(list_concat(a.grams, b.grams))), 6) >= 0.3
), und AS (
  SELECT a_id AS s, b_id AS t FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
), reach(s, t) AS (
  SELECT s, t FROM und
  UNION
  SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s WHERE u.t <> r.s
)
SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.t), d.doc_id)) AS component
FROM documents d LEFT JOIN reach r ON r.s = d.doc_id
GROUP BY d.doc_id
"""


#: Canonicalization threshold: 0.05 (vs dedup_clusters' 0.3) so the driver
#: corpus actually forms multi-document clusters (120 pairs at sf0.001) and
#: the transitive-closure → keep-list path is exercised on real groups.
_CANON_TAU = 0.05


def neardup_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup loop closed end-to-end: Jaccard pairs (jac ≥ 0.05) →
    connected components → one CANONICAL document per cluster (its minimum
    doc_id) — the row set a dedup pass actually retains. Emits, per
    canonical doc, the cluster size and how many near-dups it absorbed;
    singletons appear with cluster_size 1. Downstream this is the keep-list
    a 100 TB corpus rewrite semi-joins against."""
    pairs = ngram_jaccard_pairs(spark, sf_dir).filter(F.col("jac") >= _CANON_TAU)
    comp = connected_components(pairs, src="a_id", dst="b_id")
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labeled = docs.join(comp, docs.doc_id == comp.node, "left").select(
        F.coalesce("comp", F.col("doc_id")).alias("component")
    )
    return (
        labeled.groupBy(F.col("component").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select("doc_id", "cluster_size", (F.col("cluster_size") - 1).alias("n_dropped"))
    )


# the recursive-CTE body is shared with DEDUP_CLUSTERS_SQL; the pair
# threshold drops to _CANON_TAU and the final projection groups the per-doc
# component labels into clusters
_CLUSTERS_FINAL = """SELECT d.doc_id,
       LEAST(d.doc_id, COALESCE(MIN(r.t), d.doc_id)) AS component
FROM documents d LEFT JOIN reach r ON r.s = d.doc_id
GROUP BY d.doc_id
"""
NEARDUP_CANON_SQL = (
    DEDUP_CLUSTERS_SQL.replace(">= 0.3", f">= {_CANON_TAU}").replace(_CLUSTERS_FINAL, "")
    + f""", comp AS (
  {_CLUSTERS_FINAL})
SELECT component AS doc_id,
       COUNT(*) AS cluster_size,
       COUNT(*) - 1 AS n_dropped
FROM comp GROUP BY component
"""
)


def token_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-500 whitespace tokens by frequency. The
    classic heavy-shuffle corpus statistic — partial (map-side) aggregation
    does the combining, then a global TakeOrdered picks the top k; the full
    sorted vocabulary never materializes on one node. Tie-break on the token
    string keeps the top-k set deterministic."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(500)
    )


TOKEN_VOCAB_SQL = r"""
SELECT token, COUNT(*) AS freq
FROM (SELECT UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS token
      FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 500
"""


def minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH-then-verify near-dup pairs: banded LSH (k=32, bands=16)
    proposes candidates, exact Jaccard ≥ 0.5 over candidates is the verdict.
    Oracle = brute-force all-pairs exact Jaccard, so the hash match certifies
    LSH recall on the data (miss prob at j=0.9 is ~3e-12 per pair)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return minhash_verified_pairs(docs, ngram=2, k=32, bands=16, tau=0.5)


def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-then-verify near-dup pairs: pigeonhole-blocked 64-bit SimHash
    (10 blocks → guaranteed recall for Hamming ≤ 9) proposes candidates,
    exact Jaccard ≥ 0.5 is the verdict. Same brute-force oracle as
    minhash_lsh_neardup; the two engines must agree on the certified set."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return simhash_verified_pairs(docs, ngram=2, blocks=10, tau=0.5)


# Brute-force exact-Jaccard oracle for the LSH-then-verify queries: DuckDB
# computes ALL pairs (fine at oracle scale; the Spark side never does).
NEARDUP_VERIFIED_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) - 1, 0)),
           i -> string_split_regex(TRIM(LOWER(text)), '\s+')[i] || ' ' ||
                string_split_regex(TRIM(LOWER(text)), '\s+')[i+1])) AS grams
  FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       ROUND(LEN(list_intersect(a.grams, b.grams)) /
             LEN(list_distinct(list_concat(a.grams, b.grams))), 6) AS jac
FROM sh a JOIN sh b ON b.doc_id > a.doc_id
WHERE ROUND(LEN(list_intersect(a.grams, b.grams)) /
            LEN(list_distinct(list_concat(a.grams, b.grams))), 6) >= 0.5
"""


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite training-data curation pass: per document, compute
    quality metrics + language prediction + exact-dup status, then a
    keep/drop verdict with the reject reason — the shape a 100 TB corpus
    cleaning job takes (filter thresholds are illustrative)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint("text")
    w_dup = F.min("doc_id").over(Window.partitionBy("fp"))
    scored = (
        docs.withColumn("fp", fp)
        .withColumn("keep_id", w_dup)
        .withColumn("ws_tokens", token_count("text"))
        .withColumn("punct_ratio", punct_ratio("text"))
        .withColumn("pred_lang", lang_id("text"))
    )
    reason = (
        F.when(F.col("doc_id") != F.col("keep_id"), "duplicate")
        .when(F.col("ws_tokens") < 20, "too_short")
        .when(F.col("punct_ratio") > 0.1, "too_punctuated")
        .otherwise("keep")
    )
    return scored.select(
        "doc_id",
        "pred_lang",
        "ws_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        reason.alias("verdict"),
        (reason == "keep").cast("int").alias("kept"),
    )


CURATION_SQL = rf"""
WITH scored AS (
  SELECT doc_id,
         {_FP_SQL} AS fp,
         MIN(doc_id) OVER (PARTITION BY {_FP_SQL}) AS keep_id,
         LEN(string_split_regex(TRIM(text), '\s+')) AS ws_tokens,
         LEN(regexp_extract_all(text, '[^\w\s]')) / LENGTH(text) AS punct_ratio,
         {_lang_id_sql_expr()} AS pred_lang
  FROM documents
)
SELECT doc_id, pred_lang, ws_tokens,
       ROUND(punct_ratio, 6) AS punct_ratio,
       CASE WHEN doc_id <> keep_id THEN 'duplicate'
            WHEN ws_tokens < 20 THEN 'too_short'
            WHEN punct_ratio > 0.1 THEN 'too_punctuated'
            ELSE 'keep' END AS verdict,
       CAST((CASE WHEN doc_id <> keep_id THEN 'duplicate'
                  WHEN ws_tokens < 20 THEN 'too_short'
                  WHEN punct_ratio > 0.1 THEN 'too_punctuated'
                  ELSE 'keep' END) = 'keep' AS INT) AS kept
FROM scored
"""


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation form of exact dedup: within each fingerprint group keep the
    BEST document (longest text, doc_id tiebreak) — max_by over the dup
    group, the reference's MAX-on-collision pattern (A7/A10) applied to
    corpus curation."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    return (
        docs.withColumn("_fp", fp)
        .groupBy("_fp")
        .agg(
            F.max_by(
                "doc_id", F.struct(F.length("text").alias("l"), (-F.col("doc_id")).alias("i"))
            ).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
            F.max(F.length("text")).alias("best_len"),
        )
        .select(F.col("_fp").alias("fp"), "keep_id", "n_dups", "best_len")
    )


DEDUP_KEEP_BEST_SQL = f"""
WITH ranked AS (
  SELECT {_FP_SQL} AS fp, doc_id, length(text) AS len,
         ROW_NUMBER() OVER (PARTITION BY {_FP_SQL}
                            ORDER BY length(text) DESC, doc_id ASC) AS rn
  FROM documents
)
SELECT fp,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
       COUNT(*) AS n_dups,
       MAX(len) AS best_len
FROM ranked
GROUP BY fp
"""


def sample_exact_k_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-k-per-source sample (k=5): rank by the hash-mix
    ordering key, tie-break on doc_id — the fixed-size complement to the
    rate-based mix below, for eval subsets and per-source quotas where
    "exactly k" matters. Fully oracle-checkable because the ordering key is
    plain int64 arithmetic both engines compute bit-identically."""
    from schwab_elt_etl_pipeline_spark.operators.sampling import exact_k_per_group

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return exact_k_per_group(docs, key="doc_id", strata_col="source", k=5).select(
        "doc_id", "source", "sample_rank"
    )


SAMPLE_EXACT_K_SQL = """
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ((doc_id % 1000003) * 2654435761) % 999983, doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= 5
"""


def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: per-source sampling rates (the
    training-data "10 % of web, 50 % of books" mix), decided by a key hash so
    reruns/backfills/oracles agree on the exact row set. Output: per-source
    kept counts + total chars (the mixing report)."""
    from schwab_elt_etl_pipeline_spark.operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_hash_sample(
        docs,
        key="doc_id",
        strata_col="source",
        fractions={"src0": 0.5, "src1": 0.2, "src2": 0.1},
        default_fraction=0.05,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


CORPUS_MIX_SQL = """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE ((doc_id % 1000003) * 2654435761) % 999983 % 1000 <
      CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 200
                  WHEN 'src2' THEN 100 ELSE 50 END
GROUP BY source
"""


SPECS = [
    QuerySpec("dedup_exact", dedup_exact, DEDUP_EXACT_SQL, doc="exact dedup via hash groupBy"),
    QuerySpec("dedup_keep_best", dedup_keep_best, DEDUP_KEEP_BEST_SQL,
              doc="exact dedup keeping the best doc per group"),
    QuerySpec("corpus_mix_sample", corpus_mix_sample, CORPUS_MIX_SQL,
              doc="deterministic per-source corpus mixing"),
    QuerySpec("sample_exact_k_stratified", sample_exact_k_stratified,
              SAMPLE_EXACT_K_SQL,
              doc="deterministic exact-k-per-source sample (hash-rank order)"),
    QuerySpec("curation_pipeline", curation_pipeline, CURATION_SQL, headline=True,
              doc="composite curation: dedup + quality + lang → keep/drop verdicts"),
    QuerySpec("text_quality", text_quality, TEXT_QUALITY_SQL, headline=True,
              doc="quality scoring: tokens/punct/stopwords"),
    QuerySpec("lang_id_heuristic", lang_id_heuristic, LANG_ID_SQL, doc="marker-lexicon language ID"),
    QuerySpec("doc_fingerprint", doc_fingerprint, DOC_FINGERPRINT_SQL, doc="document fingerprinting"),
    QuerySpec("ngram_jaccard_pairs", ngram_jaccard_pairs, NGRAM_JACCARD_SQL, headline=True,
              doc="banded exact n-gram Jaccard near-dup"),
    QuerySpec("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_SQL, headline=True,
              doc="near-dup clusters: pairs → connected components → canonical id"),
    QuerySpec("neardup_canonicalize", neardup_canonicalize, NEARDUP_CANON_SQL,
              headline=True,
              doc="end-to-end dedup keep-list: one canonical doc per near-dup cluster"),
    QuerySpec("token_vocab_topk", token_vocab_topk, TOKEN_VOCAB_SQL,
              doc="corpus vocabulary top-k by frequency"),
    QuerySpec("minhash_lsh_neardup", minhash_lsh_neardup, NEARDUP_VERIFIED_SQL,
              doc="MinHash-LSH-then-verify near-dup (oracle certifies LSH recall)"),
    QuerySpec("simhash_neardup", simhash_neardup, NEARDUP_VERIFIED_SQL,
              doc="pigeonhole-SimHash-then-verify near-dup (oracle certifies recall)"),
]
