"""Curation wave 2: decontamination, repetition quality, PII scrubbing,
semantic dedup, hierarchical rollups, fixed-centroid assignment, hopping
windows. All oracle-checked.

These extend the LLM-data-pipeline surface (BASELINE.json north-star) past
wave 1 (llm_text.py): the guards a training corpus needs before tokenization
(benchmark decontamination, Gopher-style repetition rules, PII redaction,
embedding-level dedup) plus the metrics-store rollup cascade and the hopping
twin of the tumbling-window family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.curation import (
    boilerplate_scrub,
    decontaminate,
    eval_gram_set,
    pii_counts,
    pii_redact,
    repetition_stats,
    semantic_dedup_verdicts,
)
from schwab_elt_etl_pipeline_spark.operators.dedup import (
    dup_char_excise_rebuild,
    dup_char_spans,
    passage_dedup_rebuild,
    substring_dedup_rebuild,
)
from schwab_elt_etl_pipeline_spark.operators.rollup import (
    rollup_coarser,
    rollup_minutes,
    rollup_read,
)
from schwab_elt_etl_pipeline_spark.operators.similarity import as_double
from schwab_elt_etl_pipeline_spark.sources import load_table

# Shared DuckDB fragments (identical tokenization to operators/dedup.py's
# with_shingles: casefold, trim, split on runs of whitespace).
_TOKS = r"string_split_regex(TRIM(LOWER(text)), '\s+')"


def _grams_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"ts[i+{k}]" for k in range(n))
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, GREATEST(LEN(ts) - {n - 1}, 0)), i -> {parts}))"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out "benchmark" split


def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-vs-benchmark decontamination: fraction of each training
    document's distinct 3-grams that appear in the eval split's gram set
    (docs with doc_id % 97 == 0). The eval gram set broadcasts; corpus-side
    work is one explode + one aggregation — linear at 100 TB."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    grams = eval_gram_set(docs.filter(is_eval), "text", n=3)
    return decontaminate(docs.filter(~is_eval), grams, n=3, threshold=0.5)


DECONTAM_SQL = f"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), sh AS (
  SELECT doc_id, {_grams_sql(3)} AS grams FROM tok
), eg AS (
  SELECT DISTINCT UNNEST(grams) AS gram FROM sh WHERE doc_id % {_EVAL_MOD} = 0
), ex AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
), per AS (
  SELECT ex.doc_id,
         COUNT(*) AS n_grams,
         COUNT(eg.gram) AS n_hit
  FROM ex LEFT JOIN eg USING (gram)
  GROUP BY ex.doc_id
)
SELECT d.doc_id,
       COALESCE(per.n_grams, 0) AS n_grams,
       COALESCE(per.n_hit, 0) AS n_hit,
       ROUND(COALESCE(per.n_hit / per.n_grams, 0.0), 6) AS overlap,
       CAST(COALESCE(per.n_hit / per.n_grams, 0.0) >= 0.5 AS INT) AS contaminated
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.doc_id % {_EVAL_MOD} <> 0
"""


# ---------------------------------------------------------------------------
# Repetition quality (Gopher-style)
# ---------------------------------------------------------------------------


def gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: top-token fraction, distinct-token
    ratio, duplicate-2-gram fraction, and the keep/drop flag."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return repetition_stats(docs, top_token_max=0.2, dup_2gram_max=0.3)


GOPHER_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), per_token AS (
  SELECT doc_id, t.token, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(ts) AS token FROM tok) t
  GROUP BY doc_id, t.token
), stats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS top_c
  FROM per_token GROUP BY doc_id
), grams AS (
  SELECT doc_id, LEN({_grams_sql(2)}) AS d2 FROM tok
)
SELECT s.doc_id, s.n_tokens,
       ROUND(s.n_distinct / s.n_tokens, 6) AS distinct_ratio,
       ROUND(s.top_c / s.n_tokens, 6) AS top_token_frac,
       ROUND(CASE WHEN s.n_tokens > 1
                  THEN 1.0 - g.d2 / (s.n_tokens - 1) ELSE 0.0 END, 6)
         AS dup_2gram_frac,
       CAST(s.top_c / s.n_tokens > 0.2 OR
            (CASE WHEN s.n_tokens > 1
                  THEN 1.0 - g.d2 / (s.n_tokens - 1) ELSE 0.0 END) > 0.3
            AS INT) AS repetitive
FROM stats s JOIN grams g USING (doc_id)
"""


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Deterministic PII synthesis: the corpus tables carry no real PII, so the
# query plants one email/phone/SSN per document (keyed off doc_id) and then
# scrubs them — the redaction+counting operators are the thing under test.
def _pii_synth_spark() -> list:
    return [
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or call 415-"),
        F.lpad(((F.col("doc_id") * 7) % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") * 13) % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    ]

_PII_SYNTH_SQL = (
    "text || ' contact user' || doc_id || '@mail' || (doc_id % 7)"
    " || '.example.com or call 415-'"
    " || lpad(CAST((doc_id * 7) % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0')"
    " || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

# Same patterns as operators/curation.py (kept regex-dialect-portable).
_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_SQL = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"
_SSN_SQL = "\\b\\d{3}-\\d{2}-\\d{4}\\b"


def pii_redact_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over synthesized contact lines: typed-placeholder redaction
    plus per-type match counts, all JVM regex (no UDFs)."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(*_pii_synth_spark())
    return docs.select(
        "doc_id",
        pii_redact(raw).alias("redacted"),
        *pii_counts(raw),
    )


PII_SQL = f"""
WITH raw AS (
  SELECT doc_id, {_PII_SYNTH_SQL} AS r FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(r,
         '{_EMAIL_SQL}', '<EMAIL>', 'g'),
         '{_SSN_SQL}', '<SSN>', 'g'),
         '{_PHONE_SQL}', '<PHONE>', 'g') AS redacted,
       LEN(regexp_extract_all(r, '{_EMAIL_SQL}')) AS n_email,
       LEN(regexp_extract_all(r, '{_PHONE_SQL}')) AS n_phone,
       LEN(regexp_extract_all(r, '{_SSN_SQL}')) AS n_ssn
FROM raw
"""


# ---------------------------------------------------------------------------
# Semantic dedup (embedding-level keep/drop)
# ---------------------------------------------------------------------------


def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped verdicts: a vector is dropped when a lower-id
    neighbor within the id band has cosine ≥ 0.3."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_verdicts(emb, band=20, threshold=0.3)


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

SEMANTIC_DEDUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND({_COS.format(a="a.v", b="b.v")}, 6) AS cos
  FROM e a JOIN e b ON b.vec_id > a.vec_id AND b.vec_id - a.vec_id <= 20
  WHERE ROUND({_COS.format(a="a.v", b="b.v")}, 6) >= 0.3
), d AS (
  SELECT b_id, MIN(a_id) AS dup_of, MAX(cos) AS max_cos FROM pairs GROUP BY b_id
)
SELECT e.vec_id,
       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS kept,
       COALESCE(d.dup_of, -1) AS dup_of,
       COALESCE(d.max_cos, 0.0) AS max_cos
FROM e LEFT JOIN d ON d.b_id = e.vec_id
"""


def semantic_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop over MULTI-TABLE sign-LSH buckets — the 100 TB
    candidate generator, end-to-end. Axis-aligned hyperplanes make the
    blocking SQL-expressible, so the oracle recomputes the same buckets:
    candidate generation is hash-checked, not just recall-gated."""
    from schwab_elt_etl_pipeline_spark.operators.curation import (
        semantic_dedup_lsh_verdicts,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup_lsh_verdicts(emb, bits=4, tables=4, threshold=0.3)


def _tbl_bucket_sql(v: str, t: int, bits: int = 4) -> str:
    terms = " | ".join(
        f"CASE WHEN {v}[{t * bits + i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
        for i in range(bits)
    )
    return f"({terms})"


_LSH_MATCH = " OR ".join(
    f"{_tbl_bucket_sql('a.v', t)} = {_tbl_bucket_sql('b.v', t)}" for t in range(4)
)

SEMANTIC_DEDUP_LSH_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND({_COS.format(a="a.v", b="b.v")}, 6) AS cos
  FROM e a JOIN e b ON b.vec_id > a.vec_id AND ({_LSH_MATCH})
  WHERE ROUND({_COS.format(a="a.v", b="b.v")}, 6) >= 0.3
), d AS (
  SELECT b_id, MIN(a_id) AS dup_of, MAX(cos) AS max_cos FROM pairs GROUP BY b_id
)
SELECT e.vec_id,
       CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS kept,
       COALESCE(d.dup_of, -1) AS dup_of,
       COALESCE(d.max_cos, 0.0) AS max_cos
FROM e LEFT JOIN d ON d.b_id = e.vec_id
"""


# ---------------------------------------------------------------------------
# Hierarchical rollup cascade (hypertable continuous-aggregate shape)
# ---------------------------------------------------------------------------


def rollup_multires_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour event rollup computed THROUGH the cascade (raw → 1 min → 5 min
    → 1 h), re-aggregating partials at each level. Exact-decimal sums make
    the cascade bit-identical to a direct aggregate — which is exactly what
    the oracle computes."""
    ev = load_table(spark, sf_dir, "events")
    m1 = rollup_minutes(ev, keys=["event_type"], ts="ts", value="value", minutes=1)
    m5 = rollup_coarser(m1, keys=["event_type"], minutes=5)
    h1 = rollup_coarser(m5, keys=["event_type"], minutes=60)
    return rollup_read(h1)


ROLLUP_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS bucket_ts,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Fixed-centroid assignment (the k-means E-step, oracle-checkable)
# ---------------------------------------------------------------------------

_N_CENTROIDS = 8


def kmeans_assign_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment against a fixed centroid set (vectors
    with vec_id < 8): the E-step of k-means / the cell-routing step of IVF,
    as a broadcast cross join + per-vector argmax. Unlike the trained-IVF
    query (rows-only), fixed centroids make the step SQL-expressible."""
    from schwab_elt_etl_pipeline_spark.operators.similarity import (
        centroid_fold,
        l2_norm,
        nearest_centroid_struct,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < _N_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("c_vec")
    )
    # ONE-row centroid-array broadcast + per-row argmax fold: no k× fan-out,
    # no per-vector argmax window shuffle (guide §2.4); the hoisted norms
    # evaluate the identical dot/(qn*cn) expression tree, so the rounded
    # cosine — and the winner — is bit-identical to the window form.
    best = nearest_centroid_struct(
        F.col("q_vec"), F.col("_qn"), zero_safe=False
    )
    return (
        emb.select(F.col("vec_id"), as_double("embedding").alias("q_vec"))
        .withColumn("_qn", l2_norm(F.col("q_vec")))
        .crossJoin(F.broadcast(centroid_fold(cents)))
        .withColumn("_best", best)
        .select(
            "vec_id",
            F.col("_best")["cid"].alias("cluster"),
            F.col("_best")["s"].alias("cos"),
        )
    )


KMEANS_ASSIGN_SQL = f"""
WITH c AS (
  SELECT vec_id AS cent_id, embedding::DOUBLE[] AS c_vec
  FROM embeddings WHERE vec_id < {_N_CENTROIDS}
), q AS (
  SELECT vec_id, embedding::DOUBLE[] AS q_vec FROM embeddings
), scored AS (
  SELECT q.vec_id, c.cent_id,
         ROUND({_COS.format(a="q_vec", b="c_vec")}, 6) AS cos
  FROM q, c
)
SELECT vec_id, cent_id AS cluster, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) = 1
"""


# ---------------------------------------------------------------------------
# BPE pair statistics (one tokenizer-training merge step)
# ---------------------------------------------------------------------------


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of BPE training: corpus-wide frequencies of ADJACENT
    token pairs (non-distinct — a pair occurring twice in one document counts
    twice), top-100 by count. The merge loop would take the argmax pair,
    rewrite the corpus, and re-count; each iteration is this same
    map-side-combinable aggregation, which is why BPE training parallelizes
    cleanly: the only global state per round is one winning pair."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = F.when(
        F.size(F.col("_toks")) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.expr(
            "transform(sequence(1, size(_toks) - 1),"
            " i -> concat(_toks[i-1], ' ', _toks[i]))"
        )
    )
    # materialize the pair array before exploding: Generate over a
    # lambda-built array re-evaluates the interpreted lambda per emitted
    # element (see operators/curation.py _exploded_shingles)
    mat = (
        docs.withColumn("_toks", toks)
        .select(pairs.alias("pairs"))
        .localCheckpoint(eager=False)
    )
    return (
        mat.select(F.explode("pairs").alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(100)
    )


BPE_PAIR_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), pairs AS (
  SELECT UNNEST(list_transform(
           generate_series(1, GREATEST(LEN(ts) - 1, 0)),
           i -> ts[i] || ' ' || ts[i+1])) AS pair
  FROM tok
)
SELECT pair, COUNT(*) AS freq
FROM pairs GROUP BY pair
ORDER BY freq DESC, pair ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Document chunking (overlapping token windows)
# ---------------------------------------------------------------------------

_CHUNK = 32
_STRIDE = 24  # 8-token overlap between consecutive chunks


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping token-window chunks (size 32,
    stride 24) — the pre-tokenization step of training-data and retrieval
    pipelines. Pure array expressions (sequence → explode → slice): the
    fan-out is rows × ceil(tokens/stride), all inside codegen, no UDFs."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (
        docs.withColumn("_toks", toks)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("_toks"), F.lit(_STRIDE))
            ).alias("start"),
            "_toks",
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / _STRIDE).cast("int").alias("chunk_id"),
            F.size(F.slice("_toks", F.col("start"), _CHUNK)).alias("chunk_tokens"),
            F.array_join(F.slice("_toks", F.col("start"), _CHUNK), " ").alias("chunk_text"),
        )
    )


DOC_CHUNK_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), starts AS (
  SELECT doc_id, ts, UNNEST(generate_series(1, LEN(ts), {_STRIDE})) AS start FROM tok
)
SELECT doc_id,
       CAST((start - 1) // {_STRIDE} AS INT) AS chunk_id,
       LEN(ts[start : start + {_CHUNK} - 1]) AS chunk_tokens,
       array_to_string(ts[start : start + {_CHUNK} - 1], ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# Passage-level exact dedup (RefinedWeb/Gopher-style sub-document dedup)
# ---------------------------------------------------------------------------

_PASSAGE = 20  # tokens per non-overlapping passage


def passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup: split every document into non-overlapping
    20-token passages, keep only the FIRST corpus-wide occurrence of each
    passage (ordered by doc_id, then position), and rebuild each document
    from its surviving passages — the passage-granular dedup used by
    RefinedWeb/Gopher-style curation, where boilerplate repeats across
    documents that are not whole-document duplicates.

    Shape: one explode (rows × tokens/20), one hash shuffle keyed on the
    passage text to pick first-occurrence winners, one shuffle back on
    doc_id to reassemble. Map-side the passage key would be a 128-bit
    fingerprint at 100 TB (as in ``dedup_exact``) so the wide text column
    never shuffles twice; here the window keys the raw passage so the
    first-occurrence rule is exact and oracle-checkable. Core in
    ``operators/dedup.py`` ``passage_dedup_rebuild`` (property-tested
    against a Python reference model)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return passage_dedup_rebuild(docs, passage_tokens=_PASSAGE)


PASSAGE_DEDUP_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), p AS (
  SELECT doc_id,
         CAST((start - 1) // {_PASSAGE} AS INT) AS passage_id,
         array_to_string(ts[start : start + {_PASSAGE} - 1], ' ') AS passage
  FROM (SELECT doc_id, ts, UNNEST(generate_series(1, LEN(ts), {_PASSAGE})) AS start
        FROM tok)
), r AS (
  SELECT doc_id, passage_id, passage,
         ROW_NUMBER() OVER (PARTITION BY passage ORDER BY doc_id, passage_id) AS rk
  FROM p
)
SELECT doc_id,
       COUNT(*) AS n_passages,
       COUNT(*) FILTER (WHERE rk = 1) AS n_kept,
       COALESCE(string_agg(passage, ' ' ORDER BY passage_id)
                FILTER (WHERE rk = 1), '') AS deduped_text
FROM r
GROUP BY doc_id
"""


def boilerplate_line_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet/RefinedWeb line
    rule): any 2-token line that recurs across >= greatest(2, n_docs/25)
    DISTINCT documents is boilerplate and is excised from EVERY document
    — the frequency-threshold complement of ``passage_dedup`` (which keeps
    a first occurrence; boilerplate has no first worth keeping). The
    corpus-relative threshold is evaluated in-plan as a 1-row broadcast
    scalar, so the rule means the same thing at sf0.001 and at 100 TB.

    Shape: one explode + ONE line-keyed distinct-doc count; the
    boilerplate set is Zipf-truncated to at most corpus_lines/threshold
    lines, so it broadcasts and the excision is a broadcast LEFT ANTI
    join — the wide text never shuffles on the line key. Core in
    ``operators/curation.py`` ``boilerplate_scrub``."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return boilerplate_scrub(docs, passage_tokens=2, min_docs=2, min_docs_per=25)


BOILERPLATE_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), p AS (
  SELECT doc_id,
         CAST((start - 1) // 2 AS INT) AS passage_id,
         array_to_string(ts[start : start + 1], ' ') AS passage
  FROM (SELECT doc_id, ts, UNNEST(generate_series(1, LEN(ts), 2)) AS start
        FROM tok)
), thr AS (
  SELECT GREATEST(2, COUNT(*) // 25) AS t FROM documents
), dfq AS (
  SELECT passage, COUNT(DISTINCT doc_id) AS df FROM p GROUP BY passage
), boiler AS (
  SELECT passage FROM dfq, thr WHERE df >= thr.t
)
SELECT p.doc_id,
       COALESCE(string_agg(p.passage, ' ' ORDER BY p.passage_id)
                FILTER (WHERE b.passage IS NULL), '') AS text,
       COUNT(*) AS n_lines,
       COUNT(*) FILTER (WHERE b.passage IS NOT NULL) AS n_removed
FROM p LEFT JOIN boiler b USING (passage)
GROUP BY p.doc_id
"""


# ---------------------------------------------------------------------------
# Sequence packing (concatenate-and-chunk training-sequence assignment)
# ---------------------------------------------------------------------------

_SEQ_LEN = 256  # training-sequence length in tokens


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to its fixed-length training sequences by
    concatenate-and-chunk: within each source shard, documents concatenate
    in doc_id order and the token stream is cut into ``_SEQ_LEN``-token
    sequences — the packing stage between curation and training, which
    determines how many sequences a corpus yields and how often documents
    straddle a boundary (attention-masking cost).

    Per doc: its token offset in the shard stream (exclusive prefix sum),
    the first/last sequence it lands in, and how many boundaries it crosses.
    Scale shape: ONE window (per-source running sum ordered by doc_id) — the
    cumsum is partitioned by the shard key, never a global single-partition
    ordering; at 100 TB shards are sized so each source's stream fits a
    task's sort budget (or sub-sharded by hash, same algebra).
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # integer division end-to-end (offsets are non-negative) so both engines
    # emit BIGINT, never a float floor
    seq_first = F.expr(f"tok_offset DIV {_SEQ_LEN}")
    seq_last = F.expr(f"(tok_offset + n_tok - 1) DIV {_SEQ_LEN}")
    return (
        docs.select("doc_id", "source", n_tok.cast("long").alias("n_tok"))
        .withColumn(
            "tok_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
        )
        .select(
            "doc_id",
            "source",
            "n_tok",
            "tok_offset",
            seq_first.alias("seq_first"),
            seq_last.alias("seq_last"),
            (seq_last - seq_first).alias("boundaries_crossed"),
        )
    )


def sequence_packing_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing sequence packing: documents stay WHOLE — per
    source shard, docs sorted by token length descending go into the first
    {_SEQ_LEN}-token bin with room, versus concat-and-chunk's zero-waste
    splitting. Measured on this corpus at sf0.01: FFD packs the 500 docs
    into 120 bins against concat-and-chunk's 118 sequences (+1.7% sequences)
    while cutting boundary crossings from 95 to ZERO by construction — the
    attention-masking trade training pipelines make. The greedy loop is one
    higher-order aggregate per shard (``operators/packing.py``); oracle =
    per-shard recursive-CTE greedy, the ``bpe_train_merges`` discipline."""
    from schwab_elt_etl_pipeline_spark.operators.packing import ffd_pack

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    lens = docs.select(
        "doc_id",
        "source",
        F.least(n_tok.cast("long"), F.lit(_SEQ_LEN).cast("long")).alias("len"),
    )
    return ffd_pack(lens, capacity=_SEQ_LEN)


_FFD_POS = "NULLIF(list_position(list_transform(s.rem, r -> r >= d.len), true), 0)"

SEQUENCE_PACKING_FFD_SQL = rf"""
WITH RECURSIVE t AS MATERIALIZED (
  SELECT doc_id, source,
         LEAST(CAST(LEN({_TOKS}) AS BIGINT), {_SEQ_LEN}) AS len
  FROM documents
), d AS MATERIALIZED (
  SELECT doc_id, source, len,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY len DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM t
), s AS (
  SELECT source, 0::BIGINT AS rk, CAST(NULL AS BIGINT) AS doc_id,
         CAST(NULL AS BIGINT) AS len, CAST(NULL AS INT) AS bin,
         CAST([] AS BIGINT[]) AS rem, MAX(n) AS n
  FROM d GROUP BY source
  UNION ALL
  SELECT s.source, s.rk + 1, d.doc_id, d.len,
         CAST(COALESCE({_FFD_POS}, LEN(s.rem) + 1) AS INT) AS bin,
         CASE WHEN {_FFD_POS} IS NULL THEN list_append(s.rem, {_SEQ_LEN} - d.len)
              ELSE s.rem[1:{_FFD_POS}-1] || [s.rem[{_FFD_POS}] - d.len]
                   || s.rem[{_FFD_POS}+1:LEN(s.rem)]
         END AS rem,
         s.n
  FROM s JOIN d ON d.source = s.source AND d.rk = s.rk + 1
  WHERE s.rk < s.n
)
SELECT doc_id, source, len, bin FROM s WHERE rk > 0
"""


SEQUENCE_PACKING_SQL = rf"""
WITH t AS (
  SELECT doc_id, source, CAST(LEN({_TOKS}) AS BIGINT) AS n_tok FROM documents
), o AS (
  SELECT doc_id, source, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM t
)
SELECT doc_id, source, n_tok, tok_offset,
       tok_offset // {_SEQ_LEN} AS seq_first,
       (tok_offset + n_tok - 1) // {_SEQ_LEN} AS seq_last,
       (tok_offset + n_tok - 1) // {_SEQ_LEN} - tok_offset // {_SEQ_LEN}
         AS boundaries_crossed
FROM o
"""


# ---------------------------------------------------------------------------
# Hopping (sliding) windows — overlapping twin of t_tumbling_candles
# ---------------------------------------------------------------------------


def t_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping event-time windows (15-minute window, 5-minute hop) via
    ``F.window`` with a slide — each event lands in 3 overlapping windows.
    The same expression runs under a watermark on a stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sv"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            F.col("w.end").cast("timestamp_ntz").alias("w_end"),
            "event_type",
            "n",
            F.col("sv").cast("double").alias("sum_value"),
        )
    )


HOPPING_SQL = """
WITH hops AS (
  SELECT event_type, value,
         time_bucket(INTERVAL '5 minutes', ts) - to_minutes(CAST(5 * s AS BIGINT))
           AS w_start
  FROM events, (SELECT UNNEST(generate_series(0, 2)) AS s)
)
SELECT w_start, w_start + to_minutes(15) AS w_end, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM hops
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# End-to-end corpus curation (the LLM-side flagship pipeline)
# ---------------------------------------------------------------------------


def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE curation pass as one query — the training-data
    counterpart of ``pipeline_verts_e2e``: every non-eval document flows
    through exact-dup detection, benchmark decontamination, length gating,
    and repetition gating, and exits with one verdict from a fixed-priority
    cascade (duplicate > contaminated > too_short > repetitive > keep).

    Plan shape at scale: one fingerprint window (hash-partitioned by fp),
    one broadcast join against the eval gram set, one per-(doc, token)
    map-side-combinable aggregation — the corpus is scanned once per
    signal family and never shuffled whole.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    train = docs.filter(~is_eval)

    from schwab_elt_etl_pipeline_spark.operators.text import fingerprint

    # The fingerprint window runs over the (doc_id, _fp) PROXY only (r13,
    # guide §8 "shuffle keys and metadata instead of payloads"): the former
    # form carried the text column through the _fp exchange and sort; only
    # 16 bytes/doc cross now, and the downstream join consumes just
    # (doc_id, keep_id). Same single window, identical values.
    fp = train.select("doc_id", fingerprint("text").alias("_fp")).withColumn(
        "keep_id", F.min("doc_id").over(Window.partitionBy("_fp"))
    )

    grams = eval_gram_set(docs.filter(is_eval), "text", n=3)
    decon = decontaminate(train, grams, n=3, threshold=0.5).select(
        "doc_id", "overlap", "contaminated"
    )
    rep = repetition_stats(train, top_token_max=0.2, dup_2gram_max=0.3).select(
        "doc_id", "n_tokens", "top_token_frac", "dup_2gram_frac", "repetitive"
    )

    j = fp.select("doc_id", "keep_id").join(decon, "doc_id").join(rep, "doc_id")
    verdict = (
        F.when(F.col("doc_id") != F.col("keep_id"), "duplicate")
        .when(F.col("contaminated") == 1, "contaminated")
        .when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("repetitive") == 1, "repetitive")
        .otherwise("keep")
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "overlap",
        "top_token_frac",
        "dup_2gram_frac",
        verdict.alias("verdict"),
        (verdict == "keep").cast("int").alias("kept"),
    )


CORPUS_E2E_SQL = rf"""
WITH train AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {_EVAL_MOD} <> 0
), fp AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS keep_id
  FROM train
), tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), sh AS (
  SELECT doc_id, {_grams_sql(3)} AS grams FROM tok
), eg AS (
  SELECT DISTINCT UNNEST(grams) AS gram FROM sh WHERE doc_id % {_EVAL_MOD} = 0
), ex AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM sh WHERE doc_id % {_EVAL_MOD} <> 0
), decon_raw AS (
  SELECT ex.doc_id, COUNT(*) AS n_grams, COUNT(eg.gram) AS n_hit
  FROM ex LEFT JOIN eg USING (gram) GROUP BY ex.doc_id
), decon AS (
  SELECT t.doc_id,
         ROUND(COALESCE(d.n_hit / d.n_grams, 0.0), 6) AS overlap,
         CAST(COALESCE(d.n_hit / d.n_grams, 0.0) >= 0.5 AS INT) AS contaminated
  FROM train t LEFT JOIN decon_raw d USING (doc_id)
), per_token AS (
  SELECT doc_id, t.token, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(ts) AS token FROM tok) t
  GROUP BY doc_id, t.token
), stats AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(MAX(c) AS BIGINT) AS top_c
  FROM per_token GROUP BY doc_id
), g2 AS (
  SELECT doc_id, LEN({_grams_sql(2)}) AS d2 FROM tok
), rep AS (
  SELECT s.doc_id, s.n_tokens,
         ROUND(s.top_c / s.n_tokens, 6) AS top_token_frac,
         ROUND(CASE WHEN s.n_tokens > 1
                    THEN 1.0 - g2.d2 / (s.n_tokens - 1) ELSE 0.0 END, 6) AS dup_2gram_frac,
         CAST(s.top_c / s.n_tokens > 0.2 OR
              (CASE WHEN s.n_tokens > 1
                    THEN 1.0 - g2.d2 / (s.n_tokens - 1) ELSE 0.0 END) > 0.3
              AS INT) AS repetitive
  FROM stats s JOIN g2 USING (doc_id)
)
SELECT f.doc_id, r.n_tokens, d.overlap, r.top_token_frac, r.dup_2gram_frac,
       CASE WHEN f.doc_id <> f.keep_id THEN 'duplicate'
            WHEN d.contaminated = 1 THEN 'contaminated'
            WHEN r.n_tokens < 20 THEN 'too_short'
            WHEN r.repetitive = 1 THEN 'repetitive'
            ELSE 'keep' END AS verdict,
       CAST((CASE WHEN f.doc_id <> f.keep_id THEN 'duplicate'
                  WHEN d.contaminated = 1 THEN 'contaminated'
                  WHEN r.n_tokens < 20 THEN 'too_short'
                  WHEN r.repetitive = 1 THEN 'repetitive'
                  ELSE 'keep' END) = 'keep' AS INT) AS kept
FROM fp f JOIN decon d ON d.doc_id = f.doc_id JOIN rep r ON r.doc_id = f.doc_id
"""


# ---------------------------------------------------------------------------
# Substring-granular dedup (token-window ExactSubstr form)
# ---------------------------------------------------------------------------

_SUBSTR_K = 8  # duplicate-span detection window, in tokens


def substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (token-window form of ExactSubstr, Lee et
    al. 2022): every overlapping 8-token window is ranked by corpus-wide
    first occurrence; non-first occurrences mark their tokens for removal
    and documents are rebuilt from the surviving tokens. Catches duplicated
    spans wherever they START (passage_dedup only catches spans aligned to
    fixed passage boundaries). Core in ``operators/dedup.py``
    ``substring_dedup_rebuild``; runs the ``fingerprint_key`` scale path —
    the ranking shuffle moves 8-byte hashes, ~2.6× faster at sf0.1 — which
    the oracle hash-match certifies end-to-end (and a dedicated test pins
    byte-identical to the raw-text key)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return substring_dedup_rebuild(docs, window_tokens=_SUBSTR_K, fingerprint_key=True)


SUBSTRING_DEDUP_SQL = rf"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), tokens AS (
  SELECT doc_id, UNNEST(generate_series(1, LEN(ts))) AS pos, ts FROM tok
), wins AS (
  SELECT doc_id, start, array_to_string(ts[start : start + {_SUBSTR_K} - 1], ' ') AS wtext
  FROM (SELECT doc_id, UNNEST(generate_series(1, LEN(ts) - {_SUBSTR_K} + 1)) AS start, ts
        FROM tok WHERE LEN(ts) >= {_SUBSTR_K})
), dup AS (
  SELECT doc_id, start AS pos
  FROM (SELECT doc_id, start,
               ROW_NUMBER() OVER (PARTITION BY wtext ORDER BY doc_id, start) AS rk
        FROM wins)
  WHERE rk > 1
), marked AS (
  SELECT t.doc_id, t.pos, t.ts[t.pos] AS token,
         MAX(CASE WHEN d.pos IS NOT NULL THEN t.pos + {_SUBSTR_K} - 1 END)
           OVER (PARTITION BY t.doc_id ORDER BY t.pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cover_end
  FROM tokens t LEFT JOIN dup d ON d.doc_id = t.doc_id AND d.pos = t.pos
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       COUNT(*) FILTER (WHERE cover_end >= pos) AS n_dropped,
       COALESCE(string_agg(token, ' ' ORDER BY pos)
                FILTER (WHERE cover_end IS NULL OR cover_end < pos), '') AS deduped_text
FROM marked
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Byte-exact duplicate spans (character-granular ExactSubstr form)
# ---------------------------------------------------------------------------

_SPAN_L = 40  # duplicate-span detection window, in characters


def substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-granular ExactSubstr duplicate spans (Lee et al. 2022's
    suffix-array semantics, distributed as L-gram seed-and-merge): every
    maximal character span all of whose stride-1 40-char windows occur >= 2
    times corpus-wide — i.e. the byte-exact removal mask, identical to what
    a suffix-array scan emits at threshold 40. Two-pass shuffle: 8-byte
    hash-keyed counting, then exact gram confirmation over the hot minority
    (a 64-bit collision can nominate a candidate, never fabricate a span).
    Core in ``operators/dedup.py`` ``dup_char_spans``. Complements the
    token-window ``substring_dedup``, which rebuilds text; this emits the
    spans themselves with 1-based inclusive character positions. The
    repartition before the stride-1 explode matters: a single small input
    file is ONE scan partition, and the ~300 windows/doc blow-up must fan
    out BEFORE it happens, not after (same discipline as
    ``substring_dedup``)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return dup_char_spans(docs, min_len=_SPAN_L)


SUBSTRING_DUP_SPANS_SQL = f"""
WITH w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         substring(text, CAST(i AS INT), {_SPAN_L}) AS gram
  FROM documents,
       UNNEST(generate_series(1, length(text) - {_SPAN_L - 1})) AS t(i)
  WHERE length(text) >= {_SPAN_L}
), hot AS (
  SELECT gram FROM w GROUP BY gram HAVING count(*) >= 2
), dup AS (
  SELECT doc_id, pos FROM w WHERE gram IN (SELECT gram FROM hot)
), flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         + {_SPAN_L}
              THEN 1 ELSE 0 END AS new_isl
  FROM dup
), isl AS (
  SELECT doc_id, pos,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM flagged
)
SELECT doc_id,
       min(pos) AS span_start,
       max(pos) + {_SPAN_L - 1} AS span_end,
       max(pos) + {_SPAN_L - 1} - min(pos) + 1 AS span_len,
       count(*) AS n_windows
FROM isl
GROUP BY doc_id, isl
"""


def substring_dup_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-granular ExactSubstr dedup with the Lee et al. removal
    policy APPLIED: the corpus-wide first occurrence (by doc, then
    position) of every duplicated >= 40-char substring survives; later
    occurrences' characters are excised and documents rebuild from the
    survivors. The actionable twin of ``substring_dup_spans`` (the
    duplication map) and the char-granular twin of ``substring_dedup``
    (token windows). Core in ``operators/dedup.py``
    ``dup_char_excise_rebuild`` — shared two-pass candidate front end
    (8-byte hash count, exact-gram ranking over the hot minority only) and
    the SAME running-coverage excision back end as the token form, with
    characters as tokens and an empty rebuild separator."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return dup_char_excise_rebuild(docs, min_len=_SPAN_L)


SUBSTRING_DUP_EXCISE_SQL = f"""
WITH chars AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         substring(text, CAST(i AS INT), 1) AS ch
  FROM documents, UNNEST(generate_series(1, length(text))) AS t(i)
  WHERE length(text) >= 1
), w AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         substring(text, CAST(i AS INT), {_SPAN_L}) AS gram
  FROM documents,
       UNNEST(generate_series(1, length(text) - {_SPAN_L - 1})) AS t(i)
  WHERE length(text) >= {_SPAN_L}
), dup AS (
  SELECT doc_id, pos
  FROM (SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rk
        FROM w)
  WHERE rk > 1
), marked AS (
  SELECT c.doc_id, c.pos, c.ch,
         MAX(CASE WHEN d.pos IS NOT NULL THEN c.pos + {_SPAN_L - 1} END)
           OVER (PARTITION BY c.doc_id ORDER BY c.pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cover_end
  FROM chars c LEFT JOIN dup d ON d.doc_id = c.doc_id AND d.pos = c.pos
)
SELECT doc_id,
       COUNT(*) AS n_chars,
       COUNT(*) FILTER (WHERE cover_end >= pos) AS n_dropped,
       COALESCE(string_agg(ch, '' ORDER BY pos)
                FILTER (WHERE cover_end IS NULL OR cover_end < pos), '')
         AS deduped_text
FROM marked
GROUP BY doc_id
"""


SPECS = [
    QuerySpec("substring_dedup", substring_dedup, SUBSTRING_DEDUP_SQL, headline=True,
              doc="substring-granular ExactSubstr dedup: overlapping-window spans, boundary-free"),
    QuerySpec("substring_dup_spans", substring_dup_spans, SUBSTRING_DUP_SPANS_SQL,
              headline=True,
              doc="byte-exact ExactSubstr duplicate spans: suffix-array semantics via L-gram seed-and-merge"),
    QuerySpec("substring_dup_excise", substring_dup_excise, SUBSTRING_DUP_EXCISE_SQL,
              headline=True,
              doc="char-granular ExactSubstr dedup applied: first occurrence survives, text rebuilt"),
    QuerySpec("corpus_curation_e2e", corpus_curation_e2e, CORPUS_E2E_SQL,
              headline=True,
              doc="FULL curation pipeline: dup + decontam + length + repetition → verdict cascade"),
    QuerySpec("decontam_ngram_overlap", decontam_ngram_overlap, DECONTAM_SQL,
              doc="benchmark decontamination: 3-gram overlap vs eval split"),
    QuerySpec("gopher_repetition", gopher_repetition, GOPHER_SQL,
              doc="repetition quality rules: top-token/dup-2gram fractions"),
    QuerySpec("pii_redact_scrub", pii_redact_scrub, PII_SQL,
              doc="regex PII redaction with per-type counts"),
    QuerySpec("semantic_dedup_keep", semantic_dedup_keep, SEMANTIC_DEDUP_SQL,
              doc="SemDeDup-shaped embedding dedup verdicts"),
    QuerySpec("semantic_dedup_lsh", semantic_dedup_lsh, SEMANTIC_DEDUP_LSH_SQL,
              doc="SemDeDup over multi-table sign-LSH buckets (100 TB generator)"),
    QuerySpec("rollup_multires_1h", rollup_multires_1h, ROLLUP_SQL,
              doc="hierarchical rollup cascade 1min→5min→1h, exact partials"),
    QuerySpec("kmeans_assign_fixed", kmeans_assign_fixed, KMEANS_ASSIGN_SQL,
              doc="fixed-centroid k-means E-step assignment"),
    QuerySpec("bpe_pair_stats", bpe_pair_stats, BPE_PAIR_SQL,
              doc="BPE training pair-count step (non-distinct adjacent pairs)"),
    QuerySpec("passage_dedup", passage_dedup, PASSAGE_DEDUP_SQL, headline=True,
              doc="sub-document passage-level exact dedup with text rebuild"),
    QuerySpec("boilerplate_line_scrub", boilerplate_line_scrub, BOILERPLATE_SQL,
              headline=True,
              doc="CCNet-style corpus-frequency boilerplate line removal"),
    QuerySpec("sequence_packing", sequence_packing, SEQUENCE_PACKING_SQL,
              doc="concatenate-and-chunk training-sequence assignment per shard"),
    QuerySpec("sequence_packing_ffd", sequence_packing_ffd, SEQUENCE_PACKING_FFD_SQL,
              doc="first-fit-decreasing bin packing (docs kept whole), recursive-CTE greedy oracle"),
    QuerySpec("doc_chunking", doc_chunking, DOC_CHUNK_SQL,
              doc="overlapping token-window chunking (size 32 / stride 24)"),
    QuerySpec("t_hopping_windows", t_hopping_windows, HOPPING_SQL, headline=True,
              doc="hopping event-time windows (15 min / 5 min hop)"),
]


# ---------------------------------------------------------------------------
# Training-data preparation, end-to-end (the LLM twin of corpus_curation_e2e)
# ---------------------------------------------------------------------------


def _training_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tok, logit): the curation front of the training-
    prep pass — exact dedup (fingerprint first-winner) -> passage-level
    dedup with text rebuild -> quantile quality gate on the REBUILT text
    (drop the bottom 20%). ONE definition shared by both packing variants
    (`training_prep_e2e` chunk, `training_prep_ffd_e2e` bin-pack)."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics6 import (
        quality_features,
        quality_logit,
    )
    from schwab_elt_etl_pipeline_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # First-winner ids via a PROXY aggregate + doc_id-keyed semi-join (r13,
    # guide §8): the former fingerprint window shuffled the full text rows
    # by _fp; here only (doc_id, _fp) pairs cross the fingerprint exchange
    # and the corpus is pruned on its existing doc_id partitioning (the
    # repartition above), so the text never shuffles at all. min-per-group
    # == min-over-partition exactly (doc_id unique).
    keep_ids = (
        docs.select("doc_id", fingerprint("text").alias("_fp"))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surv1 = docs.join(keep_ids, "doc_id", "left_semi").select(
        "doc_id", "source", "text"
    )
    rebuilt = passage_dedup_rebuild(surv1, passage_tokens=_PASSAGE).select(
        "doc_id", "deduped_text"
    ).join(surv1.select("doc_id", "source"), "doc_id")
    scored = rebuilt.select(
        "doc_id", "source", *quality_features("deduped_text")
    ).select(
        "doc_id", "source", F.col("n_tok").cast("long").alias("n_tok"),
        quality_logit().alias("logit"),
    ).localCheckpoint(eager=False)
    thr = scored.agg(F.expr("percentile(logit, 0.2)").alias("thr"))
    return scored.crossJoin(F.broadcast(thr)).filter(
        F.col("logit") >= F.col("thr")
    )


def training_prep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-data preparation pass as ONE oracle-checked
    query: exact dedup (fingerprint first-winner) → passage-level dedup with
    text rebuild → quantile quality gate scored on the REBUILT text (drop
    the bottom 20%) → concatenate-and-chunk sequence packing of the
    survivors. Output: one row per packed document with its token offsets
    and quality score — the manifest a training job reads.

    Plan shape at scale: one fingerprint window, the passage pair of
    shuffles, a map-only feature projection, a 1-row broadcast threshold,
    and one per-source cumsum window — no global ordering, no unbounded
    join, every stage individually plan-pinned by its standalone query."""
    surv2 = _training_survivors(spark, sf_dir)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = surv2.withColumn(
        "tok_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    )
    seq_first = F.expr(f"tok_offset DIV {_SEQ_LEN}")
    seq_last = F.expr(f"(tok_offset + n_tok - 1) DIV {_SEQ_LEN}")
    return packed.select(
        "doc_id",
        "source",
        "n_tok",
        "tok_offset",
        seq_first.alias("seq_first"),
        seq_last.alias("seq_last"),
        F.round("logit", 6).alias("logit"),
    )


def _training_prep_prefix() -> str:
    """The shared curation-front CTE chain (fp ... surv2) of both
    training-prep oracles — compose after a WITH / WITH RECURSIVE."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics6 import (
        _W0,
        _W_STOP,
        _W_TOK,
        _W_UNIQ,
        _W_WLEN,
    )
    from schwab_elt_etl_pipeline_spark.operators.text import LANG_MARKERS

    nt = r"string_split_regex(TRIM(LOWER(new_text)), '\s+')"
    logit = (
        f"{_W0} + {_W_TOK} * (CAST(LEN({nt}) AS DOUBLE) / 1000.0)"
        f" + {_W_WLEN} * (CAST(LEN(regexp_replace(TRIM(LOWER(new_text)), '\\s+', '', 'g')) AS DOUBLE)"
        f"   / CAST(LEN({nt}) AS DOUBLE))"
        f" + {_W_STOP} * (CAST(LEN(regexp_extract_all(LOWER(new_text), '{LANG_MARKERS['en']}')) AS DOUBLE)"
        f"   / CAST(LEN({nt}) AS DOUBLE))"
        f" + {_W_UNIQ} * (CAST(LEN(list_distinct({nt})) AS DOUBLE)"
        f"   / CAST(LEN({nt}) AS DOUBLE))"
    )
    return rf"""fp AS (
  SELECT doc_id, source, text,
         MIN(doc_id) OVER (
           PARTITION BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
         ) AS keep_id
  FROM documents
), surv1 AS (
  SELECT doc_id, source, text FROM fp WHERE doc_id = keep_id
), tok AS (
  SELECT doc_id, source, {_TOKS} AS ts FROM surv1
), p AS (
  SELECT doc_id,
         CAST((start - 1) // {_PASSAGE} AS INT) AS passage_id,
         array_to_string(ts[start : start + {_PASSAGE} - 1], ' ') AS passage
  FROM (SELECT doc_id, ts, UNNEST(generate_series(1, LEN(ts), {_PASSAGE})) AS start
        FROM tok)
), rr AS (
  SELECT doc_id, passage_id, passage,
         ROW_NUMBER() OVER (PARTITION BY passage ORDER BY doc_id, passage_id) AS rk
  FROM p
), rebuilt AS (
  SELECT doc_id,
         COALESCE(string_agg(passage, ' ' ORDER BY passage_id)
                  FILTER (WHERE rk = 1), '') AS new_text
  FROM rr GROUP BY doc_id
), scored AS (
  SELECT r.doc_id, t.source,
         CAST(LEN({nt}) AS BIGINT) AS n_tok,
         {logit} AS logit
  FROM rebuilt r JOIN tok t USING (doc_id)
), thr AS (
  SELECT quantile_cont(logit, 0.2) AS thr FROM scored
), surv2 AS (
  SELECT doc_id, source, n_tok, logit FROM scored, thr WHERE logit >= thr
)"""


TRAINING_PREP_SQL = rf"""
WITH {_training_prep_prefix()}, o AS (
  SELECT doc_id, source, n_tok, logit,
         CAST(COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tok_offset
  FROM surv2
)
SELECT doc_id, source, n_tok, tok_offset,
       tok_offset // {_SEQ_LEN} AS seq_first,
       (tok_offset + n_tok - 1) // {_SEQ_LEN} AS seq_last,
       ROUND(logit, 6) AS logit
FROM o
"""


def training_prep_ffd_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-prep pass ending in FIRST-FIT-DECREASING packing: the
    shared curation front (exact dedup -> passage dedup -> quality gate,
    `_training_survivors`) feeds `ffd_pack` instead of concat-and-chunk —
    the manifest variant where no surviving document straddles a sequence
    boundary. Packing depends only on the survivors' integer token counts
    (clamped to {_SEQ_LEN}), so the composite inherits the front's
    float-determinism certification unchanged. Output: one row per packed
    document with its bin and quality score."""
    from schwab_elt_etl_pipeline_spark.operators.packing import ffd_pack

    surv2 = _training_survivors(spark, sf_dir)
    lens = surv2.select(
        "doc_id",
        "source",
        F.least(F.col("n_tok"), F.lit(_SEQ_LEN).cast("long")).alias("len"),
    )
    packed = ffd_pack(lens, capacity=_SEQ_LEN)
    return packed.join(
        surv2.select("doc_id", "n_tok", F.round("logit", 6).alias("logit")),
        "doc_id",
    ).select("doc_id", "source", "n_tok", "len", "bin", "logit")


TRAINING_PREP_FFD_SQL = rf"""
WITH RECURSIVE {_training_prep_prefix()}, t AS MATERIALIZED (
  SELECT doc_id, source, LEAST(n_tok, {_SEQ_LEN}) AS len, n_tok,
         ROUND(logit, 6) AS logit
  FROM surv2
), d AS MATERIALIZED (
  SELECT doc_id, source, len,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY len DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM t
), s AS (
  SELECT source, 0::BIGINT AS rk, CAST(NULL AS BIGINT) AS doc_id,
         CAST(NULL AS BIGINT) AS len, CAST(NULL AS INT) AS bin,
         CAST([] AS BIGINT[]) AS rem, MAX(n) AS n
  FROM d GROUP BY source
  UNION ALL
  SELECT s.source, s.rk + 1, d.doc_id, d.len,
         CAST(COALESCE({_FFD_POS}, LEN(s.rem) + 1) AS INT) AS bin,
         CASE WHEN {_FFD_POS} IS NULL THEN list_append(s.rem, {_SEQ_LEN} - d.len)
              ELSE s.rem[1:{_FFD_POS}-1] || [s.rem[{_FFD_POS}] - d.len]
                   || s.rem[{_FFD_POS}+1:LEN(s.rem)]
         END AS rem,
         s.n
  FROM s JOIN d ON d.source = s.source AND d.rk = s.rk + 1
  WHERE s.rk < s.n
)
SELECT s.doc_id, s.source, t.n_tok, s.len, s.bin, t.logit
FROM s JOIN t ON t.doc_id = s.doc_id WHERE s.rk > 0
"""


# registered here (not in the mid-file SPECS literal) because the e2e builder
# is defined below that list
SPECS.append(
    QuerySpec("training_prep_e2e", training_prep_e2e, TRAINING_PREP_SQL,
              headline=True,
              doc="e2e training prep: exact dedup -> passage dedup -> quality gate -> packing")
)
SPECS.append(
    QuerySpec("training_prep_ffd_e2e", training_prep_ffd_e2e,
              TRAINING_PREP_FFD_SQL,
              doc="e2e training prep ending in first-fit-decreasing packing "
                  "(docs kept whole); shared curation front, recursive-CTE "
                  "greedy oracle")
)
