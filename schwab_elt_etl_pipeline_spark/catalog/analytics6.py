"""Fourth analytics wave: corpus statistics and behavioral analytics.

Corpus side (LLM-pipeline first-class ops):
- unigram-rarity quality scoring — a log-free, cross-engine-deterministic
  stand-in for unigram-LM pseudo-perplexity (the classic "looks like
  gibberish" filter);
- per-document TF-IDF top-k keywords (rational score, no transcendentals);
- a deterministic linear quality classifier (fastText-style feature scoring
  with fixed weights — the model-scoring stage of a curation cascade).

Behavioral side (events table):
- ordered conversion funnel (signup → view → click → purchase);
- weekly retention cohorts;
- integer walk counting over a co-click item graph (exact iterative graph
  joins — the pattern PageRank/label-propagation reuse, with an integer
  measure so the oracle hash-matches bit-for-bit).

Determinism notes (hash-match discipline, see catalog/__init__.py): every
float column here is either a single IEEE division of exact integers or a
fixed-order linear expression over such divisions — no log/exp whose libm
implementations could differ between the JVM and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.text import LANG_MARKERS
from schwab_elt_etl_pipeline_spark.sources import load_table

#: Whitespace tokens of lowered text — mirrors llm_text.py's convention and
#: the DuckDB `string_split_regex(TRIM(LOWER(text)), '\s+')` oracle idiom.
def _toks(col: str = "text") -> F.Column:
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


# ---------------------------------------------------------------------------
# unigram rarity — pseudo-perplexity quality filter
# ---------------------------------------------------------------------------

def unigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean corpus-frequency of its tokens, in parts-per-million.

    Two corpus passes: (1) build the unigram table (map-side-combinable
    count per token — the vocabulary is bounded, so at 100 TB this is a
    small-output agg); (2) explode each document and join tokens to the
    vocabulary. The vocab side is broadcast — a document shard never
    shuffles. Low ``rarity_ppm`` ≈ the document is full of corpus-rare
    tokens (gibberish / OCR noise); the real-world twin scores a KenLM
    unigram model, which is a log of exactly this statistic. Log-free
    rational form keeps the oracle bit-identical (see module docstring).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_toks()).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    total = vocab.agg(F.sum("freq").alias("total_tokens"))
    per_doc = tok.join(F.broadcast(vocab), "token").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum("freq").alias("sum_freq"),
    )
    return (
        per_doc.crossJoin(F.broadcast(total))  # 1-row scalar, broadcast
        .select(
            "doc_id",
            "n_tok",
            (
                (F.col("sum_freq") * F.lit(1_000_000)).cast("double")
                / F.col("n_tok").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("rarity_ppm"),
        )
        .withColumn("is_rare", F.col("rarity_ppm") < 20_000.0)
    )


UNIGRAM_RARITY_SQL = r"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
),
vocab AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
total AS (SELECT SUM(freq) AS total_tokens FROM vocab),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_tok, SUM(freq) AS sum_freq
  FROM tok JOIN vocab USING (token)
  GROUP BY doc_id
)
SELECT doc_id, n_tok,
       CAST(sum_freq * 1000000 AS DOUBLE) / CAST(n_tok AS DOUBLE)
           / CAST(total_tokens AS DOUBLE) AS rarity_ppm,
       (CAST(sum_freq * 1000000 AS DOUBLE) / CAST(n_tok AS DOUBLE)
           / CAST(total_tokens AS DOUBLE)) < 20000.0 AS is_rare
FROM per_doc CROSS JOIN total
"""


# ---------------------------------------------------------------------------
# TF-IDF top-k keywords
# ---------------------------------------------------------------------------

def tfidf_topk_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document.

    IDF is kept rational (``N / df`` instead of ``ln(N/df)``) so the score is
    an exact-integer product followed by one IEEE division — monotone in the
    standard TF-IDF for fixed tf, and bit-identical across engines. The
    document-frequency table is vocabulary-sized → broadcast; the only
    shuffle is the per-(doc, token) tf aggregation. Ranking carries the token
    as tiebreaker so top-3 is deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tok = docs.select("doc_id", F.explode(_toks()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df").cast("double"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "token", "score", "rk")
    )


TFIDF_SQL = r"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
n  AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, token, score, rk FROM (
  SELECT doc_id, token,
         CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS score,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) DESC,
                    token ASC
         ) AS rk
  FROM tf JOIN df USING (token) CROSS JOIN n
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# deterministic linear quality classifier
# ---------------------------------------------------------------------------

#: Fixed "trained" weights: intercept, tokens/1k, mean word length,
#: stopword ratio, unique-token ratio. A stand-in for a fastText/logreg
#: quality model — scoring is the engine concern; training isn't.
_W0, _W_TOK, _W_WLEN, _W_STOP, _W_UNIQ = -2.0, 0.5, 0.25, 3.0, 1.5


def quality_features(text_col: str) -> list:
    """The quality classifier's feature columns over an arbitrary text
    column (reused by the e2e training-prep pipeline on REBUILT text)."""
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tok = F.size(t)
    n_alpha = F.length(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", ""))
    n_stop = F.regexp_count(F.lower(F.col(text_col)), F.lit(LANG_MARKERS["en"]))
    n_uniq = F.size(F.array_distinct(t))
    return [
        n_tok.alias("n_tok"),
        (n_alpha.cast("double") / n_tok.cast("double")).alias("mean_wlen"),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stop_ratio"),
        (n_uniq.cast("double") / n_tok.cast("double")).alias("uniq_ratio"),
    ]


def quality_logit() -> F.Column:
    """Fixed-order rational logit over the quality_features columns."""
    return (
        F.lit(_W0)
        + F.lit(_W_TOK) * (F.col("n_tok").cast("double") / F.lit(1000.0))
        + F.lit(_W_WLEN) * F.col("mean_wlen")
        + F.lit(_W_STOP) * F.col("stop_ratio")
        + F.lit(_W_UNIQ) * F.col("uniq_ratio")
    )


def quality_logit_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality score over native text features, keep = logit > 0.

    One projection pass, all codegen'd expressions — the shape of a learned
    quality-classifier scoring stage (fastText "looks like a wiki page"
    filters). The logit is reported instead of sigmoid(logit): ordering and
    thresholding are identical and ``exp`` is the one op whose libm rounding
    could differ across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select("doc_id", *quality_features("text"))
    logit = quality_logit()
    return feat.select(
        "doc_id", "n_tok", "mean_wlen", "stop_ratio", "uniq_ratio",
        logit.alias("logit"),
        (logit > F.lit(0.0)).alias("keep"),
    )


QUALITY_LOGIT_SQL = rf"""
WITH feat AS (
  SELECT doc_id,
         LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS n_tok,
         CAST(LEN(regexp_replace(TRIM(LOWER(text)), '\s+', '', 'g')) AS DOUBLE)
           / CAST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS DOUBLE) AS mean_wlen,
         CAST(LEN(regexp_extract_all(LOWER(text), '{LANG_MARKERS["en"]}')) AS DOUBLE)
           / CAST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS DOUBLE) AS stop_ratio,
         CAST(LEN(list_distinct(string_split_regex(TRIM(LOWER(text)), '\s+'))) AS DOUBLE)
           / CAST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS DOUBLE) AS uniq_ratio
  FROM documents
)
SELECT doc_id, n_tok, mean_wlen, stop_ratio, uniq_ratio,
       {_W0} + {_W_TOK} * (CAST(n_tok AS DOUBLE) / 1000.0)
             + {_W_WLEN} * mean_wlen
             + {_W_STOP} * stop_ratio
             + {_W_UNIQ} * uniq_ratio AS logit,
       ({_W0} + {_W_TOK} * (CAST(n_tok AS DOUBLE) / 1000.0)
             + {_W_WLEN} * mean_wlen
             + {_W_STOP} * stop_ratio
             + {_W_UNIQ} * uniq_ratio) > 0.0 AS keep
FROM feat
"""


# ---------------------------------------------------------------------------
# ordered conversion funnel
# ---------------------------------------------------------------------------

_FUNNEL = ["signup", "view", "click", "purchase"]


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who did signup, THEN view, THEN click, THEN
    purchase — each step strictly after the previous step's first completion.

    Staged min-timestamp joins: step k's survivors = min event time of type k
    strictly after t_{k-1}, per user. Each stage is an equi-join on user_id
    followed by a partial-aggregatable min — shuffle keyed on user_id
    throughout, so AQE reuses the partitioning across stages. Conversion is
    reported vs the step-1 population (one division of exact counts).
    """
    ev = load_table(spark, sf_dir, "events")
    reached = (
        ev.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    stages = [reached]
    for step in _FUNNEL[1:]:
        prev = stages[-1].select("user_id", F.col("t").alias("t_prev"))
        stages.append(
            ev.filter(F.col("event_type") == step)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
    counts = [
        s.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i + 1).alias("step"),
            F.lit(name).alias("step_name"),
            "users",
        )
        for i, (name, s) in enumerate(zip(_FUNNEL, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    base = stages[0].agg(F.count(F.lit(1)).alias("base_users"))
    return out.crossJoin(F.broadcast(base)).select(
        "step",
        "step_name",
        "users",
        (F.col("users").cast("double") / F.col("base_users").cast("double")).alias(
            "conv_rate"
        ),
    )


EVENT_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
),
counts AS (
  SELECT 1 AS step, 'signup'   AS step_name, COUNT(*) AS users FROM s1
  UNION ALL SELECT 2, 'view',     COUNT(*) FROM s2
  UNION ALL SELECT 3, 'click',    COUNT(*) FROM s3
  UNION ALL SELECT 4, 'purchase', COUNT(*) FROM s4
),
base AS (SELECT COUNT(*) AS base_users FROM s1)
SELECT step, step_name, users,
       CAST(users AS DOUBLE) / CAST(base_users AS DOUBLE) AS conv_rate
FROM counts CROSS JOIN base
"""


# ---------------------------------------------------------------------------
# weekly retention cohorts
# ---------------------------------------------------------------------------

def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week, counted
    distinct per week offset since the cohort week.

    Two aggregations (first-seen per user, then distinct users per
    (cohort, offset) cell) — both partial-aggregatable, both keyed on
    user_id first so the shuffle is reused. Week truncation is Monday-start
    in both Spark and DuckDB; the offset is integer day-diff / 7.
    """
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("w"))
        .distinct()
        .join(first, "user_id")
        .withColumn(
            "week_offset",
            (F.datediff(F.col("w"), F.col("cohort_week")) / F.lit(7)).cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, w) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# integer walk counting on the co-click item graph
# ---------------------------------------------------------------------------

def item_walk_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walks of length 1/2/3 from each item over the co-click graph.

    Graph: distinct directed edges (a, b), a ≠ b, between items clicked by
    the same user (item = ``props.k``). Walk counting is iterated
    edge-to-measure equi-join + sum — the exact integer skeleton of
    PageRank's power iteration (PageRank divides by degree; dividing is the
    only difference, and floats would break the bit-exact oracle). Each
    iteration is one shuffle keyed on the node id; the measure table is
    node-sized → broadcast. At 100 TB the per-user co-click fan-out is
    capped upstream (distinct items per user is bounded by the catalog
    size); the edge set stays |items|²-bounded, not |events|-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.from_json("props", "k INT")["k"].alias("item"))
        .distinct()
    )
    other = clicks.select(F.col("user_id"), F.col("item").alias("dst"))
    edges = (
        clicks.join(other, "user_id")
        .filter(F.col("item") != F.col("dst"))
        .select(F.col("item").alias("src"), "dst")
        .distinct()
    )
    w1 = edges.groupBy("src").agg(F.count(F.lit(1)).alias("w1"))
    m1 = w1.select(F.col("src").alias("node"), F.col("w1").alias("m"))
    w2 = (
        edges.join(F.broadcast(m1), edges.dst == m1.node)
        .groupBy("src")
        .agg(F.sum("m").alias("w2"))
    )
    m2 = w2.select(F.col("src").alias("node"), F.col("w2").alias("m"))
    w3 = (
        edges.join(F.broadcast(m2), edges.dst == m2.node)
        .groupBy("src")
        .agg(F.sum("m").alias("w3"))
    )
    return (
        w1.join(w2, "src")
        .join(w3, "src")
        .select(F.col("src").alias("item"), "w1", "w2", "w3")
    )


ITEM_WALKS_SQL = """
WITH clicks AS (
  SELECT DISTINCT user_id, CAST(props->>'$.k' AS INT) AS item
  FROM events WHERE event_type = 'click'
),
edges AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM clicks a JOIN clicks b USING (user_id)
  WHERE a.item <> b.item
),
w1 AS (SELECT src, COUNT(*) AS w1 FROM edges GROUP BY src),
-- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (→ float64 in pandas); Spark
-- sum(long) stays long — pin both to BIGINT for a type-stable hash.
w2 AS (SELECT e.src, CAST(SUM(m.w1) AS BIGINT) AS w2
       FROM edges e JOIN w1 m ON e.dst = m.src GROUP BY e.src),
w3 AS (SELECT e.src, CAST(SUM(m.w2) AS BIGINT) AS w3
       FROM edges e JOIN w2 m ON e.dst = m.src GROUP BY e.src)
SELECT w1.src AS item, w1.w1, w2.w2, w3.w3
FROM w1 JOIN w2 ON w1.src = w2.src JOIN w3 ON w1.src = w3.src
"""


def pagerank_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over the co-click item
    graph — in FIXED-POINT integer arithmetic so the iteration is bit-exact
    and oracle-checkable.

    Ranks are scaled by 1e9 and every update is integer ops only:
    ``r' = 0.15·1e9 + (85 · Σ_in (r div deg)) div 100``. Floating PageRank
    accumulates partials whose combination order varies with parallelism;
    the fixed-point form floors deterministically (bounded 1e-9-scale bias —
    irrelevant for ranking) and hash-matches an unrolled-CTE DuckDB oracle.
    Each iteration: one equi-join of edges to the rank table (node-keyed,
    broadcastable at this vocabulary size) + one map-side-combinable sum —
    the same shuffle shape GraphX/Pregel runs, expressed relationally. The
    co-click graph is symmetric, so there are no dangling nodes to patch.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.from_json("props", "k INT")["k"].alias("item"))
        .distinct()
    )
    other = clicks.select(F.col("user_id"), F.col("item").alias("dst"))
    edges = (
        clicks.join(other, "user_id")
        .filter(F.col("item") != F.col("dst"))
        .select(F.col("item").alias("src"), "dst")
        .distinct()
    )
    nodes = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("src").alias("node"), "d"
    )
    r = nodes.withColumn("r", F.lit(1_000_000_000).cast("long"))
    for _ in range(3):
        contrib = (
            edges.join(
                r.select(F.col("node").alias("p_node"), "d", "r"),
                edges.src == F.col("p_node"),
            )
            .select("dst", F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        r = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            "d",
            (
                F.lit(150_000_000)
                + F.expr("85 * coalesce(s, 0L) div 100")
            ).alias("r"),
        )
    return r.select("node", F.col("r").cast("bigint").alias("rank_fp"))


PAGERANK_SQL = """
WITH clicks AS (
  SELECT DISTINCT user_id, CAST(props->>'$.k' AS INT) AS item
  FROM events WHERE event_type = 'click'
),
edges AS (
  SELECT DISTINCT a.item AS src, b.item AS dst
  FROM clicks a JOIN clicks b USING (user_id) WHERE a.item <> b.item
),
nodes AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, d, CAST(1000000000 AS BIGINT) AS r FROM nodes),
r1 AS (
  SELECT n.node, n.d, 150000000 + (85 * COALESCE(SUM(p.r // p.d), 0)) // 100 AS r
  FROM nodes n LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r0 p ON p.node = e.src
  GROUP BY n.node, n.d
),
r2 AS (
  SELECT n.node, n.d, 150000000 + (85 * COALESCE(SUM(p.r // p.d), 0)) // 100 AS r
  FROM nodes n LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r1 p ON p.node = e.src
  GROUP BY n.node, n.d
),
r3 AS (
  SELECT n.node, n.d, 150000000 + (85 * COALESCE(SUM(p.r // p.d), 0)) // 100 AS r
  FROM nodes n LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r2 p ON p.node = e.src
  GROUP BY n.node, n.d
)
SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r3
"""


# ---------------------------------------------------------------------------
# token-budget corpus mixing
# ---------------------------------------------------------------------------

def corpus_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token quotas: within each source, rank documents by a
    quality key (unique-token ratio desc, doc_id asc as tiebreaker) and keep
    documents while the source's cumulative token count stays ≤ 3000 — the
    shape of assembling a pretraining mix against per-domain budgets.

    One projection pass for features, one window keyed on source (single
    shuffle; sources are the natural partition and the budget makes the
    per-source state a running integer). The quality key is a ratio of
    exact integers → bit-identical ordering across engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = _toks()
    feat = docs.select(
        "doc_id",
        "source",
        F.size(t).alias("n_tok"),
        (F.size(F.array_distinct(t)).cast("double") / F.size(t).cast("double")).alias(
            "quality"
        ),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        feat.withColumn(
            "cum_tokens", F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("kept", F.col("cum_tokens") <= 3000)
        .select("doc_id", "source", "n_tok", "quality", "cum_tokens", "kept")
    )


TOKEN_BUDGET_SQL = r"""
WITH feat AS (
  SELECT doc_id, source,
         LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS n_tok,
         CAST(LEN(list_distinct(string_split_regex(TRIM(LOWER(text)), '\s+'))) AS DOUBLE)
           / CAST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS DOUBLE) AS quality
  FROM documents
)
SELECT doc_id, source, n_tok, quality,
       CAST(SUM(n_tok) OVER (
         PARTITION BY source ORDER BY quality DESC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_tokens,
       SUM(n_tok) OVER (
         PARTITION BY source ORDER BY quality DESC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) <= 3000 AS kept
FROM feat
"""


# ---------------------------------------------------------------------------
# fuzzy (MinHash) benchmark decontamination
# ---------------------------------------------------------------------------

def decontam_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination of the corpus against a pseudo-benchmark
    (docs with ``doc_id % 7 == 0`` act as the eval set): cross-table
    MinHash-LSH proposes (train, eval) candidates, exact bigram Jaccard
    ≥ 0.5 is the verdict. The DuckDB oracle brute-forces ALL cross pairs,
    so a hash match certifies end-to-end LSH recall — the Spark side never
    materializes the cross product (eval buckets broadcast)."""
    docs = load_table(spark, sf_dir, "documents")
    evalset = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    from schwab_elt_etl_pipeline_spark.operators.curation import decontaminate_fuzzy

    return decontaminate_fuzzy(train, evalset, ngram=2, k=32, bands=16, tau=0.5)


DECONTAM_FUZZY_SQL = r"""
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) - 1, 0)),
           i -> string_split_regex(TRIM(LOWER(text)), '\s+')[i] || ' ' ||
                string_split_regex(TRIM(LOWER(text)), '\s+')[i+1])) AS grams
  FROM documents
),
ev AS (SELECT * FROM sh WHERE doc_id % 7 = 0),
corp AS (SELECT * FROM sh WHERE doc_id % 7 <> 0),
hits AS (
  SELECT c.doc_id, e.doc_id AS eval_id,
         ROUND(LEN(list_intersect(c.grams, e.grams)) /
               LEN(list_distinct(list_concat(c.grams, e.grams))), 6) AS jac
  FROM corp c CROSS JOIN ev e
  WHERE ROUND(LEN(list_intersect(c.grams, e.grams)) /
              LEN(list_distinct(list_concat(c.grams, e.grams))), 6) >= 0.5
),
best AS (
  SELECT doc_id, eval_id, jac,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_matches,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY jac DESC, eval_id ASC) AS rn
  FROM hits
)
SELECT d.doc_id,
       COALESCE(b.n_matches, 0) AS n_matches,
       CAST(COALESCE(b.eval_id, -1) AS BIGINT) AS best_eval_id,
       COALESCE(b.jac, 0.0) AS best_jac,
       COALESCE(b.n_matches, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""


# ---------------------------------------------------------------------------
# unified data-quality expectations report
# ---------------------------------------------------------------------------

def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations suite over orders: row rules (one conditional-agg scan),
    key uniqueness (map-side-combined groupBy), and referential integrity
    against customer (anti-join, dimension broadcast) — one long-format
    report, one job."""
    from schwab_elt_etl_pipeline_spark.operators.quality import dq_report

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return dq_report(
        orders,
        rules={
            "custkey_not_null": F.col("o_custkey").isNotNull(),
            "totalprice_nonneg": F.col("o_totalprice") >= 0,
            "status_known": F.col("o_orderstatus").isin("O", "F", "P"),
        },
        unique=[["o_orderkey"]],
        foreign_keys=[(["o_custkey"], customer, ["c_custkey"])],
    )


DQ_EXPECTATIONS_SQL = """
SELECT 'custkey_not_null' AS check_name, COUNT(*) AS total,
       CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS violations,
       CAST(SUM(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) = 0 AS passed
FROM orders
UNION ALL
SELECT 'totalprice_nonneg', COUNT(*),
       CAST(SUM(CASE WHEN COALESCE(o_totalprice >= 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT),
       CAST(SUM(CASE WHEN COALESCE(o_totalprice >= 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) = 0
FROM orders
UNION ALL
SELECT 'status_known', COUNT(*),
       CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 0 ELSE 1 END) AS BIGINT),
       CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) = 0
FROM orders
UNION ALL
SELECT 'unique_o_orderkey', CAST(SUM(c) AS BIGINT), CAST(SUM(c - 1) AS BIGINT),
       CAST(SUM(c - 1) AS BIGINT) = 0
FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'fk_o_custkey',
       (SELECT COUNT(*) FROM orders),
       (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL),
       (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey IS NULL) = 0
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (rational idf — log-free, fixed-order)
# ---------------------------------------------------------------------------

#: Fixed retrieval query terms (present across the synthetic corpus at
#: mid frequency, so tf saturation and idf weighting both engage).
_BM25_TERMS = ("merge", "stream", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 document scoring for a fixed 3-term query — the retrieval-side
    ranking an LLM-data pipeline uses for quality-aware sampling and
    eval-set mining.

    Determinism discipline (module docstring): idf stays RATIONAL —
    ``(N − df + 0.5)/(df + 0.5)`` instead of its log — so the score is a
    fixed-order arithmetic expression over exact integers and single IEEE
    divisions; the per-term saturation ``tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``
    uses one shared dl/avgdl division. Terms contribute in FIXED column
    order (conditional aggregation, not a per-row sum over an exploded term
    set), so no float-summation-order nondeterminism exists anywhere.

    Scale shape: ZERO data shuffles — per-doc tf comes from an array
    ``filter``+``size`` on the token array (map-only, no explode), the
    corpus stats (N, total tokens, per-term df) are one all-reduce to a
    1-row scalar broadcast back, and the per-doc side's lineage is cut
    (lazy localCheckpoint) so the corpus scans once, not three times.
    """
    docs = load_table(spark, sf_dir, "documents")
    t1, t2, t3 = _BM25_TERMS

    def tf(term: str) -> F.Column:
        return F.size(F.filter("_toks", lambda t: t == F.lit(term)))

    per_doc = (
        docs.select("doc_id", _toks().alias("_toks"))
        .select(
            "doc_id",
            F.size("_toks").alias("dl"),
            tf(t1).alias("tf1"),
            tf(t2).alias("tf2"),
            tf(t3).alias("tf3"),
        )
        .localCheckpoint(eager=False)
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        F.count(F.when(F.col("tf1") > 0, 1)).alias("df1"),
        F.count(F.when(F.col("tf2") > 0, 1)).alias("df2"),
        F.count(F.when(F.col("tf3") > 0, 1)).alias("df3"),
    )

    def term_score(tf: str, df: str) -> F.Column:
        idf = (
            (F.col("n_docs") - F.col(df)).cast("double") + F.lit(0.5)
        ) / (F.col(df).cast("double") + F.lit(0.5))
        norm_len = F.col("dl").cast("double") / (
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
        )
        sat = (F.col(tf).cast("double") * F.lit(_BM25_K1 + 1)) / (
            F.col(tf).cast("double")
            + F.lit(_BM25_K1) * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * norm_len)
        )
        return idf * sat

    return (
        per_doc.crossJoin(F.broadcast(stats))  # 1-row corpus-stats scalar
        .filter((F.col("tf1") > 0) | (F.col("tf2") > 0) | (F.col("tf3") > 0))
        .select(
            "doc_id",
            "tf1",
            "tf2",
            "tf3",
            "dl",
            F.round(
                term_score("tf1", "df1")
                + term_score("tf2", "df2")
                + term_score("tf3", "df3"),
                6,
            ).alias("bm25"),
        )
    )


def _bm25_term_sql(tf: str, df: str) -> str:
    k1, b = _BM25_K1, _BM25_B
    idf = f"((CAST(n_docs - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))"
    norm_len = "(CAST(dl AS DOUBLE) / (CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
    sat = (
        f"((CAST({tf} AS DOUBLE) * {k1 + 1}) / "
        f"(CAST({tf} AS DOUBLE) + {k1} * ({round(1.0 - b, 10)} + {b} * {norm_len})))"
    )
    return f"({idf} * {sat})"


BM25_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         LEN(string_split_regex(TRIM(LOWER(text)), '\s+')) AS dl,
         UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS token
  FROM documents
), per_doc AS (
  SELECT doc_id, ANY_VALUE(dl) AS dl,
         COUNT(*) FILTER (WHERE token = '{_BM25_TERMS[0]}') AS tf1,
         COUNT(*) FILTER (WHERE token = '{_BM25_TERMS[1]}') AS tf2,
         COUNT(*) FILTER (WHERE token = '{_BM25_TERMS[2]}') AS tf3
  FROM tok GROUP BY doc_id
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens,
         COUNT(*) FILTER (WHERE tf1 > 0) AS df1,
         COUNT(*) FILTER (WHERE tf2 > 0) AS df2,
         COUNT(*) FILTER (WHERE tf3 > 0) AS df3
  FROM per_doc
)
SELECT doc_id, tf1, tf2, tf3, dl,
       ROUND({_bm25_term_sql("tf1", "df1")}
             + {_bm25_term_sql("tf2", "df2")}
             + {_bm25_term_sql("tf3", "df3")}, 6) AS bm25
FROM per_doc CROSS JOIN stats
WHERE tf1 > 0 OR tf2 > 0 OR tf3 > 0
"""


def quality_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the bottom 20% of documents by quality score — the relative
    (quantile) variant of the absolute ``keep = logit > 0`` gate, used when
    a corpus must shrink by a fixed fraction rather than to a fixed bar.

    Scale shape: the threshold is ONE exact percentile reduced to a 1-row
    scalar and broadcast back — never a global percent_rank window (which
    would sort the corpus on a single partition). Determinism: the logit is
    the fixed-order rational expression from quality_logit_score, and
    Spark's interpolated ``percentile`` matches DuckDB's quantile_cont
    bit-for-bit (established by a_mad_robust)."""
    scored = quality_logit_score(spark, sf_dir).select("doc_id", "logit")
    thr = scored.agg(F.expr("percentile(logit, 0.2)").alias("thr"))
    return (
        scored.crossJoin(F.broadcast(thr))  # 1-row threshold scalar
        .filter(F.col("logit") >= F.col("thr"))
        .select(
            "doc_id",
            F.round("logit", 6).alias("logit"),
            F.round("thr", 6).alias("threshold"),
        )
    )


QUALITY_QUANTILE_SQL = f"""
WITH scored AS ({QUALITY_LOGIT_SQL}),
thr AS (SELECT quantile_cont(logit, 0.2) AS thr FROM scored)
SELECT doc_id, ROUND(logit, 6) AS logit, ROUND(thr, 6) AS threshold
FROM scored, thr WHERE logit >= thr
"""


# ---------------------------------------------------------------------------
# interpolated bigram-LM perplexity gate — the CCNet/Gopher-style LM filter
# ---------------------------------------------------------------------------

def bigram_lm_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality gate: train on a held-in 80% slice,
    score every document, drop the bottom 20% by score.

    The bigram generalization of ``unigram_rarity`` (the unigram case of
    this filter) and the LM sibling of ``quality_quantile_gate``. The
    real-world twin scores a KenLM n-gram model and gates on perplexity
    (CCNet's head/middle/tail split); a log-free, cross-engine-bit-exact
    stand-in is the mean interpolated n-gram corpus frequency — perplexity
    is a log of exactly this family of statistics, and the gate (a
    quantile threshold) is rank-equivalent under any monotone transform of
    a per-token mean. Per scored position i (token with a predecessor):

        P_i = 0.75 * c2(prev_i, w_i) / B  +  0.25 * (c1(w_i) + 1) / (T + V)

    i.e. an interpolation of the trained bigram relative frequency with an
    add-1-smoothed unigram term (unseen bigrams fall back to the unigram
    component — interpolated Jelinek-Mercer shape with add-k smoothing in
    the backoff). ``score_ppm`` is the per-position mean of P_i in parts
    per million. Everything before the final expression is an INTEGER sum
    (c2/c1 are integer counts summed per document; B/T/V are integer
    corpus totals), so the float value is a fixed-order chain of two
    3-op terms over exact integers — order-independent and bit-identical
    in Spark and DuckDB (the module-docstring hash-match discipline; an
    exact rational sum of per-prev conditional ratios is NOT
    order-independent, which is why the joint-frequency form is the one
    this suite can certify).

    Scale shape: bigram extraction is a per-row array zip (no window, no
    shuffle); the model tables are Zipf-bounded vocabulary aggregations
    (map-side combinable) joined back via broadcast — at sizes past
    broadcast the same equi-joins degrade to shuffled hash joins on the
    token key. The threshold is ONE exact percentile reduced to a 1-row
    scalar and broadcast — never a global sort/percent_rank.

    Reference behavior mirrored: the staged score-then-gate curation shape
    of sql/opt.sql's quality procedures, re-expressed as a trained-model
    corpus filter.
    """
    scored = _bigram_lm_scores(spark, sf_dir)
    thr = scored.agg(F.expr("percentile(score_ppm, 0.2)").alias("thr"))
    return (
        scored.crossJoin(F.broadcast(thr))  # 1-row threshold scalar
        .filter(F.col("score_ppm") >= F.col("thr"))
        .select(
            "doc_id",
            "n_big",
            F.round("score_ppm", 6).alias("score_ppm"),
            F.round("thr", 6).alias("threshold"),
        )
    )


def _bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_big, score_ppm): the trained interpolated bigram-LM score
    for every document — shared by the absolute gate
    (``bigram_lm_perplexity_gate``) and the CCNet-style bucket split
    (``perplexity_bucket_split``). Extraction, model statistics, and the
    fixed-order scoring expression live in ``operators/langmodel.py``
    (ONE definition shared with the incremental maintainer in
    ``streaming/lm_stream.py``)."""
    from schwab_elt_etl_pipeline_spark.operators.langmodel import (
        doc_bigrams,
        doc_unigrams,
        held_in,
        lm_score_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    big = doc_bigrams(docs)
    bigram = (
        big.filter(held_in())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("bc"))
    )
    unigram = (
        doc_unigrams(docs)
        .filter(held_in())
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("uc"))
    )
    return lm_score_docs(big, bigram, unigram)


def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023): importance-weight every
    document by how target-like its n-gram mass is under two trained
    models, then draw an exact-~k PPS sample proportional to the weight.

    Target model: bigram counts of the ``lang = 'en'`` slice; raw model:
    the whole corpus. The published method weights by the log-likelihood
    ratio of hashed-n-gram models; the exact-arithmetic surrogate here is
    the CROSS-MULTIPLIED difference of bigram relative frequencies —
    ``w = sum_tc * BT_raw - sum_rc * BT_target`` (positive exactly when
    the document's trained-bigram mass is relatively more target-like),
    an all-integer expression, shifted positive by the corpus minimum.
    The cross-multiplication runs in DECIMAL(38,0) (HUGEINT on the oracle
    side): per-doc mass × corpus total passes int64's 9.2e18 once bigram
    totals reach ~1e9-scale corpora, and with ANSI off the long product
    would wrap silently. 38 digits bounds exactness at products < 1e38 —
    ~1e12 headroom over any real corpus. The stride quotients downstream
    are integral ``div``s (long results), exact while grand/k < 2^63.
    Selection reuses the deterministic cumulative-weight stride sampler
    (``sample_weighted_systematic``): integer weights, one prefix-scan
    pass (grand total rides the scan — no extra crossJoin), a row selected
    iff its weight interval crosses a stride boundary. Documents with <2
    tokens carry no bigram evidence and sit outside the sampling line.

    Scale: two vocabulary-sized model aggregations (broadcast back), one
    prefix scan — no global sort, no floats anywhere until nothing is left
    to compute.
    """
    from schwab_elt_etl_pipeline_spark.operators.langmodel import doc_bigrams
    from schwab_elt_etl_pipeline_spark.operators.prefix import prefix_agg

    k = 50
    docs = load_table(spark, sf_dir, "documents")
    big = doc_bigrams(docs)
    tmodel = (
        doc_bigrams(docs.filter(F.col("lang") == "en"))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    rmodel = big.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("rc"))
    stats = tmodel.agg(F.sum("tc").cast("long").alias("bt_t")).crossJoin(
        rmodel.agg(F.sum("rc").cast("long").alias("bt_r"))
    )
    per_doc = (
        big.join(F.broadcast(tmodel), ["prev", "cur"], "left")
        .join(F.broadcast(rmodel), ["prev", "cur"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("tc"), F.lit(0))).alias("s_t"),
            F.sum(F.coalesce(F.col("rc"), F.lit(0))).alias("s_r"),
        )
    )
    dec = "decimal(38,0)"
    w = per_doc.crossJoin(F.broadcast(stats)).select(  # 1-row model totals
        "doc_id",
        (
            F.col("s_t").cast(dec) * F.col("bt_r").cast(dec)
            - F.col("s_r").cast(dec) * F.col("bt_t").cast(dec)
        ).alias("w_raw"),
    )
    mn = w.agg(F.min("w_raw").alias("_mn"))
    wc = w.crossJoin(F.broadcast(mn)).select(  # 1-row shift scalar
        "doc_id", (F.col("w_raw") - F.col("_mn") + 1).alias("_wc")
    )
    c = prefix_agg(wc, ["doc_id"], "_wc", "_cum", how="sum", total_out="_grand")
    c = c.withColumn(
        "_t", F.greatest(F.expr(f"_grand div {k}"), F.lit(1).cast("long"))
    )
    return c.filter(F.expr("_cum div _t > (_cum - _wc) div _t")).select(
        "doc_id", F.expr("_cum div _t").alias("bucket")
    )


DSIR_SQL = r"""
WITH d AS (
  SELECT doc_id, lang, string_split_regex(TRIM(LOWER(text)), '\s+') AS t
  FROM documents
), big AS (
  SELECT doc_id, lang,
         UNNEST(t[1:len(t)-1]) AS prev,
         UNNEST(t[2:len(t)]) AS cur
  FROM d WHERE len(t) >= 2
), tmodel AS (
  SELECT prev, cur, COUNT(*) AS tc FROM big WHERE lang = 'en' GROUP BY prev, cur
), rmodel AS (
  SELECT prev, cur, COUNT(*) AS rc FROM big GROUP BY prev, cur
), stats AS (
  SELECT (SELECT CAST(SUM(tc) AS BIGINT) FROM tmodel) AS bt_t,
         (SELECT CAST(SUM(rc) AS BIGINT) FROM rmodel) AS bt_r
), per_doc AS (
  SELECT b.doc_id,
         CAST(SUM(COALESCE(t.tc, 0)) AS BIGINT) AS s_t,
         CAST(SUM(COALESCE(r.rc, 0)) AS BIGINT) AS s_r
  FROM big b
  LEFT JOIN tmodel t ON b.prev = t.prev AND b.cur = t.cur
  LEFT JOIN rmodel r ON b.prev = r.prev AND b.cur = r.cur
  GROUP BY b.doc_id
), w AS (
  SELECT doc_id,
         CAST(s_t AS HUGEINT) * bt_r - CAST(s_r AS HUGEINT) * bt_t AS w_raw
  FROM per_doc CROSS JOIN stats
), mn AS (SELECT MIN(w_raw) AS m FROM w),
wc AS (SELECT doc_id, w_raw - m + 1 AS wc FROM w, mn),
c AS (
  SELECT doc_id, wc,
         CAST(SUM(wc) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(wc) OVER () AS BIGINT) AS grand FROM wc),
p AS (SELECT doc_id, wc, cum, GREATEST(grand // 50, 1) AS t FROM c)
SELECT doc_id, cum // t AS bucket
FROM p WHERE cum // t > (cum - wc) // t
"""


def perplexity_bucket_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus split on the trained bigram-LM score:
    the top third of documents by score is ``head``, the middle third
    ``middle``, the rest ``tail`` (CCNet trains on head+middle and drops or
    down-weights tail). The two cut points are ONE exact two-quantile
    aggregation reduced to a 1-row scalar and broadcast — the same
    no-global-sort shape as the gate; the bucket label is two comparisons
    against bit-identical thresholds, so the split is deterministic
    end-to-end."""
    scored = _bigram_lm_scores(spark, sf_dir)
    # 1D/3D: double division (1.0/3.0 would be DECIMAL(8,6) — a truncated
    # fraction that differs from the oracle's IEEE 1/3)
    cuts = scored.agg(
        F.expr("percentile(score_ppm, array(1D/3D, 2D/3D))").alias("c")
    )
    return scored.crossJoin(F.broadcast(cuts)).select(  # 1-row cut scalars
        "doc_id",
        F.round("score_ppm", 6).alias("score_ppm"),
        F.when(F.col("score_ppm") >= F.col("c")[1], F.lit("head"))
        .when(F.col("score_ppm") >= F.col("c")[0], F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


_BIGRAM_SCORE_CTES = r"""d AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS t FROM documents
), big AS (
  SELECT doc_id,
         UNNEST(t[1:len(t)-1]) AS prev,
         UNNEST(t[2:len(t)]) AS cur
  FROM d WHERE len(t) >= 2
), uni AS (
  SELECT doc_id, UNNEST(t) AS token FROM d
), bigram AS (
  SELECT prev, cur, COUNT(*) AS bc FROM big WHERE doc_id % 5 > 0 GROUP BY prev, cur
), unigram AS (
  SELECT token, COUNT(*) AS uc FROM uni WHERE doc_id % 5 > 0 GROUP BY token
), stats AS (
  SELECT (SELECT CAST(SUM(bc) AS BIGINT) FROM bigram) AS bt,
         (SELECT CAST(SUM(uc) AS BIGINT) FROM unigram) AS ut,
         (SELECT COUNT(*) FROM unigram) AS v
), per_doc AS (
  SELECT b.doc_id,
         COUNT(*) AS n_big,
         CAST(SUM(COALESCE(g.bc, 0)) AS BIGINT) AS sum_bc,
         CAST(SUM(COALESCE(u.uc, 0)) AS BIGINT) AS sum_uc
  FROM big b
  LEFT JOIN bigram g ON b.prev = g.prev AND b.cur = g.cur
  LEFT JOIN unigram u ON b.cur = u.token
  GROUP BY b.doc_id
), scored AS (
  SELECT doc_id, n_big,
         CAST(sum_bc AS DOUBLE) / CAST(n_big AS DOUBLE) / CAST(bt AS DOUBLE)
             * 750000.0
         + CAST(sum_uc + n_big AS DOUBLE) / CAST(n_big AS DOUBLE)
             / CAST(ut + v AS DOUBLE) * 250000.0 AS score_ppm
  FROM per_doc CROSS JOIN stats
)"""


BIGRAM_LM_SQL = f"""
WITH {_BIGRAM_SCORE_CTES},
thr AS (SELECT quantile_cont(score_ppm, 0.2) AS thr FROM scored)
SELECT doc_id, n_big, ROUND(score_ppm, 6) AS score_ppm,
       ROUND(thr, 6) AS threshold
FROM scored, thr WHERE score_ppm >= thr
"""


PERPLEXITY_BUCKET_SQL = f"""
WITH {_BIGRAM_SCORE_CTES},
cuts AS (
  SELECT quantile_cont(score_ppm, CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)) AS c1,
         quantile_cont(score_ppm, CAST(2 AS DOUBLE) / CAST(3 AS DOUBLE)) AS c2
  FROM scored
)
SELECT doc_id, ROUND(score_ppm, 6) AS score_ppm,
       CASE WHEN score_ppm >= c2 THEN 'head'
            WHEN score_ppm >= c1 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored, cuts
"""


def doremi_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style iterative domain-mixture reweighting (Xie et al. 2023):
    per source domain, an excess-loss signal against a fixed reference
    model drives a multiplicative weight update over 2 unrolled rounds,
    then the token budget re-mixes by the final weights — extending
    ``dsir_importance_select`` from per-document selection to per-domain
    proportions.

    Deterministic surrogate (all integer, the DSIR discipline): reference
    model = the ``lang = 'en'`` target slice's bigram counts; the round-k
    proxy model = the mixture of PER-SOURCE bigram models weighted by the
    current w_k. Excess for domain s is the cross-multiplied comparison
    e_k(s) = SR(s)*PT_k - SP_k(s)*RT (positive when s is more
    reference-like than the current mixture), and the update is the
    rational multiplicative rule
    w_{k+1} = (w_k * (500000 + ((e_k + mx_k)*500000) div mx_k)) div 1e6
    with mx_k = max |e_k| — factors span [0.5x, 1.5x], everything stays a
    nonnegative integer (div == floor on both engines), products run in
    DECIMAL(38,0)/HUGEINT like DSIR.

    Scale shape: the corpus is touched ONCE — a (prev, cur, source, lang)
    count grain is the Zipf-bounded sufficient statistic, from which the
    per-source models, the reference mass SR(s) = sum_b c(s,b)*rc(b), and
    the sources x sources mass matrix MM(s, s') = sum_b c(s,b)*c(s',b)
    all follow as vocab-level joins (no occurrence fan-out anywhere) —
    after which every round is a sources-sized matrix-vector product with
    1-row broadcast totals; rounds never rescan the corpus.
    Oracle: the same algebra as chained CTEs (the ``kmeans_lloyd_train``
    pattern). Output: (source, weight, tokens) for a 1e9-token budget.
    """
    from schwab_elt_etl_pipeline_spark.operators.langmodel import doc_bigrams

    dec = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    srcs = docs.select("source").distinct().localCheckpoint(eager=True)
    # ONE corpus pass: the (prev, cur, source, lang) count grain is the
    # Zipf-bounded sufficient statistic for EVERYTHING below — csrc and
    # rmodel are marginals of it, and SR/MM fold occurrence-level sums
    # into vocab-level products (sum over occurrences of rc == sum over
    # bigrams of c*rc — the same integers, reordered), so no later stage
    # rescans the corpus or fans out per occurrence.
    grain = (
        doc_bigrams(docs)
        .join(docs.select("doc_id", "source", "lang"), "doc_id")
        .groupBy("prev", "cur", "source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # csrc feeds BOTH sides of the mm self-join, sr, and ct (per round):
    # pin it once instead of re-aggregating grain at every use (r13,
    # guide §5 "caching is worth it when a DataFrame is reused")
    csrc = (
        grain.groupBy("prev", "cur", "source")
        .agg(F.sum("c").alias("c"))
        .localCheckpoint(eager=True)
    )
    ct = csrc.groupBy(F.col("source").alias("s2")).agg(
        F.sum("c").cast(dec).alias("ct")
    )
    rmodel = (
        grain.filter(F.col("lang") == "en")
        .groupBy("prev", "cur")
        .agg(F.sum("c").alias("rc"))
    )
    rt = rmodel.agg(F.sum("rc").cast(dec).alias("rt"))
    sr = (
        csrc.join(rmodel, ["prev", "cur"])
        .groupBy("source")
        .agg(F.sum(F.col("c").cast(dec) * F.col("rc")).cast(dec).alias("sr"))
    )
    mm = (
        csrc.join(
            csrc.select(
                "prev", "cur", F.col("source").alias("s2"), F.col("c").alias("c2")
            ),
            ["prev", "cur"],
        )
        .groupBy("source", "s2")
        .agg(F.sum(F.col("c").cast(dec) * F.col("c2")).cast(dec).alias("mm"))
        .localCheckpoint(eager=True)  # sources x sources; rounds reuse it
    )
    base = (
        srcs.join(sr, "source", "left")
        .select("source", F.coalesce("sr", F.lit(0).cast(dec)).alias("sr"))
        .localCheckpoint(eager=True)
    )

    w = srcs.select("source", F.lit(1000000).cast("long").alias("w"))
    for _ in range(2):
        pt = (
            w.join(ct, w["source"] == ct["s2"])
            .agg(F.sum(F.col("w").cast(dec) * F.col("ct")).cast(dec).alias("pt"))
        )
        sp = (
            mm.join(w.select(F.col("source").alias("s2"), "w"), "s2")
            .groupBy("source")
            .agg(F.sum(F.col("w").cast(dec) * F.col("mm")).cast(dec).alias("sp"))
        )
        e = (
            base.join(sp, "source", "left")
            .crossJoin(F.broadcast(pt))  # 1-row mixture total
            .crossJoin(F.broadcast(rt))  # 1-row reference total
            .select(
                "source",
                (
                    F.col("sr") * F.col("pt")
                    - F.coalesce("sp", F.lit(0).cast(dec)) * F.col("rt")
                ).alias("e"),
            )
        )
        mx = e.agg(
            F.greatest(
                F.max("e"), -F.min("e"), F.lit(1).cast(dec)
            ).alias("mx")
        )
        w = (
            e.join(w, "source")
            .crossJoin(F.broadcast(mx))  # 1-row max-|excess| scalar
            .select(
                "source",
                F.expr(
                    "cast((cast(w as decimal(38,0)) *"
                    " (500000 + (((e + mx) * 500000) div mx)))"
                    " div 1000000 as long)"
                ).alias("w"),
            )
            .localCheckpoint(eager=True)  # sources-sized round state
        )
    sw = w.agg(F.sum("w").cast(dec).alias("sw"))
    return (
        w.crossJoin(F.broadcast(sw))  # 1-row weight total
        .select(
            "source",
            F.col("w").alias("weight"),
            F.expr(
                "cast((1000000000 * cast(w as decimal(38,0))) div sw as long)"
            ).alias("tokens"),
        )
    )


def _doremi_round_sql(k: int) -> str:
    """One DoReMi round as chained CTE text: w{k-1} -> pt{k}/sp{k}/e{k}/mx{k}/w{k}."""
    p, n = k - 1, k
    return f"""
pt{n} AS (SELECT CAST(SUM(w{p}.w * ct.ct) AS HUGEINT) AS pt
          FROM w{p} JOIN ct ON w{p}.source = ct.s2),
sp{n} AS (SELECT mm.src AS source, CAST(SUM(w{p}.w * mm.mm) AS HUGEINT) AS sp
          FROM mm JOIN w{p} ON mm.s2 = w{p}.source GROUP BY mm.src),
e{n} AS (SELECT s.source,
                COALESCE(sr.sr, 0) * pt{n}.pt - COALESCE(sp{n}.sp, 0) * rt.rt AS e
         FROM srcs s LEFT JOIN sr USING (source) LEFT JOIN sp{n} USING (source),
              pt{n}, rt),
mx{n} AS (SELECT GREATEST(MAX(e), -MIN(e), 1::HUGEINT) AS mx FROM e{n}),
w{n} AS (SELECT e{n}.source,
               (w{p}.w * (500000 + (((e{n}.e + mx{n}.mx) * 500000) // mx{n}.mx)))
                 // 1000000 AS w
        FROM e{n} JOIN w{p} USING (source), mx{n})"""


def kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram quality score (d = 3/4, Chen &
    Goodman) — the exact-rational member of the LM family: every
    per-bigram probability is ONE DECIMAL(38,0) cross-multiplication
    floored to parts-per-billion, unseen histories back off to the KN
    continuation probability N1+(.,w)/T, and the per-doc score is an
    integer mean — no floats anywhere, so Spark and DuckDB (HUGEINT)
    agree bit-for-bit. Trained on the shared held-in slice
    (``operators/langmodel.py held_in``), scored over the whole corpus
    through the shared ``doc_bigrams`` extraction; the derived KN
    statistics (c(v), N1+(v,.), N1+(.,w), T) are Zipf-bounded vocabulary
    aggregations that broadcast."""
    from schwab_elt_etl_pipeline_spark.operators.langmodel import (
        doc_bigrams,
        held_in,
        kn_score_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    big = doc_bigrams(docs)
    trained = (
        doc_bigrams(docs.filter(held_in()))
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
    )
    return kn_score_docs(big, trained)


KNESER_NEY_SQL = r"""
WITH d AS (
  SELECT doc_id, string_split_regex(TRIM(LOWER(text)), '\s+') AS t FROM documents
), big AS (
  SELECT doc_id,
         UNNEST(t[1:len(t)-1]) AS prev,
         UNNEST(t[2:len(t)]) AS cur
  FROM d WHERE len(t) >= 2
), bigram AS (
  SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS bc
  FROM big WHERE doc_id % 5 > 0 GROUP BY prev, cur
), pp AS (
  SELECT prev, CAST(SUM(bc) AS BIGINT) AS cv, CAST(COUNT(*) AS BIGINT) AS n1v
  FROM bigram GROUP BY prev
), pc AS (
  SELECT cur, CAST(COUNT(*) AS BIGINT) AS n1w FROM bigram GROUP BY cur
), tt AS (
  -- GREATEST(.., 1): same empty-model zero-divisor floor as kn_stats
  SELECT CAST(GREATEST(COUNT(*), 1) AS BIGINT) AS tt FROM bigram
), scored AS (
  SELECT b.doc_id,
         CASE WHEN pp.cv IS NOT NULL THEN CAST(
           ((CAST(GREATEST(4 * COALESCE(g.bc, 0) - 3, 0) AS HUGEINT) * tt.tt
             + 3 * CAST(pp.n1v AS HUGEINT) * COALESCE(pc.n1w, 0))
            * 1000000000)
           // (4 * CAST(pp.cv AS HUGEINT) * tt.tt) AS BIGINT)
         ELSE CAST(
           (CAST(COALESCE(pc.n1w, 0) AS HUGEINT) * 1000000000) // tt.tt
           AS BIGINT) END AS ppb
  FROM big b
  LEFT JOIN bigram g ON g.prev = b.prev AND g.cur = b.cur
  LEFT JOIN pp ON pp.prev = b.prev
  LEFT JOIN pc ON pc.cur = b.cur
  CROSS JOIN tt
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_big,
       CAST(SUM(ppb) // COUNT(*) AS BIGINT) AS kn_avg_ppb
FROM scored GROUP BY doc_id
"""


DOREMI_SQL = rf"""
WITH d AS MATERIALIZED (
  SELECT doc_id, source, lang,
         string_split_regex(TRIM(LOWER(text)), '\s+') AS t
  FROM documents
), big AS MATERIALIZED (
  SELECT doc_id, source, lang,
         UNNEST(t[1:len(t)-1]) AS prev, UNNEST(t[2:len(t)]) AS cur
  FROM d WHERE len(t) >= 2
), srcs AS (SELECT DISTINCT source FROM documents),
csrc AS MATERIALIZED (
  SELECT prev, cur, source, COUNT(*) AS c FROM big GROUP BY prev, cur, source
),
ct AS (SELECT source AS s2, CAST(SUM(c) AS HUGEINT) AS ct FROM csrc GROUP BY source),
rmodel AS MATERIALIZED (
  SELECT prev, cur, COUNT(*) AS rc FROM big WHERE lang = 'en' GROUP BY prev, cur
),
rt AS (SELECT CAST(SUM(rc) AS HUGEINT) AS rt FROM rmodel),
sr AS (SELECT b.source, CAST(SUM(r.rc) AS HUGEINT) AS sr
       FROM big b JOIN rmodel r USING (prev, cur) GROUP BY b.source),
mm AS MATERIALIZED (
  SELECT b.source AS src, c.source AS s2, CAST(SUM(c.c) AS HUGEINT) AS mm
  FROM big b JOIN csrc c ON b.prev = c.prev AND b.cur = c.cur
  GROUP BY b.source, c.source
),
w0 AS (SELECT source, 1000000::HUGEINT AS w FROM srcs),
{_doremi_round_sql(1)},
{_doremi_round_sql(2)},
sw AS (SELECT CAST(SUM(w) AS HUGEINT) AS sw FROM w2)
SELECT source, CAST(w AS BIGINT) AS weight,
       CAST((1000000000::HUGEINT * w) // sw AS BIGINT) AS tokens
FROM w2, sw
"""


SPECS = [
    QuerySpec("doremi_mixture_reweight", doremi_mixture_reweight, DOREMI_SQL,
              headline=True,
              doc="DoReMi-style iterative domain reweighting: integer excess "
                  "loss vs en-target model, 2 multiplicative rounds, "
                  "token-budget re-mix"),
    QuerySpec("quality_quantile_gate", quality_quantile_gate, QUALITY_QUANTILE_SQL,
              doc="drop bottom-20%-by-quality via broadcast exact-percentile threshold"),
    QuerySpec("bm25_retrieval", bm25_retrieval, BM25_SQL, headline=True,
              doc="BM25 document scoring, rational idf (log-free, fixed order)"),
    QuerySpec("unigram_rarity", unigram_rarity, UNIGRAM_RARITY_SQL,
              doc="log-free unigram pseudo-perplexity quality filter"),
    QuerySpec("bigram_lm_perplexity_gate", bigram_lm_perplexity_gate,
              BIGRAM_LM_SQL, headline=True,
              doc="interpolated bigram-LM quality gate, trained on held-in "
                  "slice, bottom-quantile drop"),
    QuerySpec("kneser_ney_score", kneser_ney_score, KNESER_NEY_SQL,
              doc="interpolated Kneser-Ney bigram score (d=3/4) as exact "
                  "DECIMAL(38,0)/HUGEINT rationals, parts-per-billion"),
    QuerySpec("dsir_importance_select", dsir_importance_select, DSIR_SQL,
              doc="DSIR-style importance resampling: target-vs-raw bigram "
                  "mass weights (all-integer), exact-k PPS stride draw"),
    QuerySpec("perplexity_bucket_split", perplexity_bucket_split,
              PERPLEXITY_BUCKET_SQL,
              doc="CCNet head/middle/tail split on the bigram-LM score via "
                  "one broadcast two-quantile cut"),
    QuerySpec("tfidf_topk_keywords", tfidf_topk_keywords, TFIDF_SQL,
              doc="per-doc top-3 TF-IDF keywords, rational IDF"),
    QuerySpec("quality_logit_score", quality_logit_score, QUALITY_LOGIT_SQL,
              doc="deterministic linear quality classifier scoring"),
    QuerySpec("event_funnel", event_funnel, EVENT_FUNNEL_SQL,
              doc="ordered 4-step conversion funnel"),
    QuerySpec("retention_cohorts", retention_cohorts, RETENTION_SQL,
              doc="weekly cohort retention matrix"),
    QuerySpec("item_walk_counts", item_walk_counts, ITEM_WALKS_SQL,
              doc="integer walk counts on co-click graph (power-iteration skeleton)"),
    QuerySpec("decontam_fuzzy", decontam_fuzzy, DECONTAM_FUZZY_SQL,
              doc="cross-table MinHash fuzzy decontamination, recall-certified"),
    QuerySpec("corpus_token_budget_mix", corpus_token_budget_mix, TOKEN_BUDGET_SQL,
              doc="per-source token-budget quota mixing"),
    QuerySpec("dq_expectations_orders", dq_expectations_orders, DQ_EXPECTATIONS_SQL,
              doc="unified expectations report: row rules + uniqueness + FK"),
    QuerySpec("pagerank_fixed_point", pagerank_fixed_point, PAGERANK_SQL,
              headline=True,
              doc="bit-exact fixed-point PageRank, 3 power iterations"),
]
