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




def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth diagnostic: how many DISTINCT token
    types the corpus has seen after each eighth of the global token
    stream (documents in doc_id order) — the curve a tokenizer-budget or
    dedup-health check reads before committing a vocab size (Heaps 1978,
    public literature; sublinear growth is the healthy shape, a linear
    tail flags unmixed or synthetic data).

    Scale shape: the global token offsets come from the two-phase
    ``prefix_agg`` scan (never a SinglePartition window); type first
    occurrences are ONE token-keyed min; the 8-bucket cumulation is a
    bounded 8-row window. Integer-exact throughout: a type at global
    position p belongs to checkpoint i iff 8p <= i*total (the floor-free
    equivalence both engines evaluate identically).

    Output: (checkpoint 1..8, n_tokens_prefix, n_types).
    """
    from schwab_elt_etl_pipeline_spark.operators.prefix import prefix_agg

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("ts")
    )
    sized = docs.select("doc_id", "ts", F.size("ts").cast("long").alias("n_toks"))
    offs = prefix_agg(
        sized,
        order_by=["doc_id"],
        value="n_toks",
        out="off",
        inclusive=False,
        total_out="total",
    ).select("doc_id", "ts", F.coalesce("off", F.lit(0)).alias("off"), "total")
    firsts = (
        offs.select(
            "off",
            "total",
            F.posexplode("ts").alias("p0", "tok"),
        )
        .select(
            "tok",
            (F.col("off") + F.col("p0") + 1).alias("gpos"),
            "total",
        )
        .groupBy("tok")
        .agg(F.min("gpos").alias("fp"), F.first("total").alias("total"))
    )
    buckets = (
        firsts.select(
            F.expr("(8 * fp + total - 1) div total").alias("cp"), "total"
        )
        .groupBy("cp")
        .agg(F.count(F.lit(1)).alias("n_new"), F.first("total").alias("total"))
    )
    grid = (
        buckets.select("total")
        .limit(1)
        .select(F.explode(F.sequence(F.lit(1), F.lit(8))).alias("cp"), "total")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("cp").rowsBetween(Window.unboundedPreceding, 0)
    return (
        grid.join(buckets.select("cp", "n_new"), "cp", "left")
        .withColumn("n_types", F.sum(F.coalesce("n_new", F.lit(0))).over(w))
        .select(
            F.col("cp").cast("int").alias("checkpoint"),
            F.expr("cp * total div 8").alias("n_tokens_prefix"),
            F.col("n_types").cast("long").alias("n_types"),
        )
    )


HEAPS_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), sized AS (
  SELECT doc_id, ts, CAST(LEN(ts) AS BIGINT) AS n_toks FROM tok
), offs AS (
  SELECT doc_id, ts,
         COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
         SUM(n_toks) OVER () AS total
  FROM sized
), firsts AS (
  SELECT ts[p] AS tok, MIN(off + p) AS fp, ANY_VALUE(total) AS total
  FROM (SELECT ts, off, total, UNNEST(generate_series(1, LEN(ts))) AS p
        FROM offs)
  GROUP BY ts[p]
), buckets AS (
  SELECT (8 * fp + total - 1) // total AS cp, COUNT(*) AS n_new,
         ANY_VALUE(total) AS total
  FROM firsts GROUP BY (8 * fp + total - 1) // total
), grid AS (
  SELECT UNNEST(generate_series(1, 8)) AS cp,
         (SELECT ANY_VALUE(total) FROM buckets) AS total
)
SELECT CAST(g.cp AS INT) AS checkpoint,
       CAST(g.cp * g.total // 8 AS BIGINT) AS n_tokens_prefix,
       CAST(SUM(COALESCE(b.n_new, 0)) OVER (ORDER BY g.cp
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_types
FROM grid g LEFT JOIN buckets b ON b.cp = g.cp
"""



def corpus_stats_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the one-pass corpus panel a curation run
    publishes next to its output shards: document/token volume, length
    envelope, corpus-wide exact-duplicate exposure, and language profile
    per source. All counts integer-exact; the dominant language breaks
    ties lexicographically so the report hash-matches across engines.

    Scale shape: ONE normalized-text-keyed count (the exact-dup exposure —
    at 100 TB the key is the 128-bit fingerprint as in ``dedup_exact``),
    one (source, lang) count, and one source-keyed fold; no sorts, no
    windows, no driver scalars.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.trim(F.lower(F.col("text"))).alias("norm"),
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).cast("long").alias("n_toks"),
    )
    dup = docs.groupBy("norm").agg(F.count(F.lit(1)).alias("_n"))
    flagged = docs.join(dup, "norm").withColumn(
        "is_dup", (F.col("_n") > 1).cast("long")
    )
    base = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("n_toks").alias("min_toks"),
        F.max("n_toks").alias("max_toks"),
        F.sum("is_dup").alias("n_dup_docs"),
        F.count_distinct("lang").alias("n_langs"),
    )
    # deterministic argmax: (count desc, lang asc) as a min over
    # struct(-count, lang) — no window, one fold
    top = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("lc"))
        .groupBy("source")
        .agg(F.min(F.struct((-F.col("lc")).alias("neg"), F.col("lang").alias("lang"))).alias("_b"))
        .select("source", F.col("_b.lang").alias("top_lang"))
    )
    return base.join(top, "source").select(
        "source", "n_docs", "n_tokens", "min_toks", "max_toks",
        "n_dup_docs", "n_langs", "top_lang",
    )


CORPUS_STATS_SQL = rf"""
WITH d AS (
  SELECT doc_id, source, lang, TRIM(LOWER(text)) AS norm,
         CAST(LEN({_TOKS}) AS BIGINT) AS n_toks
  FROM documents
), dup AS (
  SELECT norm, COUNT(*) AS _n FROM d GROUP BY norm
), f AS (
  SELECT d.*, CASE WHEN dup._n > 1 THEN 1 ELSE 0 END AS is_dup
  FROM d JOIN dup USING (norm)
), base AS (
  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         MIN(n_toks) AS min_toks, MAX(n_toks) AS max_toks,
         CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
         COUNT(DISTINCT lang) AS n_langs
  FROM f GROUP BY source
), lc AS (
  SELECT source, lang, COUNT(*) AS lc FROM d GROUP BY source, lang
), top AS (
  SELECT source, lang AS top_lang,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY lc DESC, lang ASC) AS rk
  FROM lc
)
SELECT b.source, b.n_docs, b.n_tokens, b.min_toks, b.max_toks,
       b.n_dup_docs, b.n_langs, t.top_lang
FROM base b JOIN top t ON t.source = b.source AND t.rk = 1
"""

SPECS = [
    QuerySpec(
        "corpus_stats_report", corpus_stats_report, CORPUS_STATS_SQL,
        doc="per-source dataset card: volume, length envelope, exact-dup "
            "exposure, language profile — one pass, integer-exact",
    ),
    QuerySpec(
        "heaps_vocab_growth", heaps_vocab_growth, HEAPS_SQL,
        doc="Heaps-law vocabulary-growth curve at 8 global-token checkpoints "
            "via the two-phase prefix scan",
    ),
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
