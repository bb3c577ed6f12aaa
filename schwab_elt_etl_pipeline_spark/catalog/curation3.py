"""Round-5 curation wave: tokenizer merge application and embedding-space
class centroids — the two ops between "curated text" and "training batches".

``bpe_apply_merges`` is the corpus-tokenization kernel (see
``operators/tokenize.py``); ``embedding_label_centroids`` is the per-class
mean-pool every semantic-dedup / clustering / IVF-training pass needs, in
the order-independent exact-decimal form that makes it oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.curation import (
    semantic_decontam,
    semantic_dedup_verdicts,
)
from schwab_elt_etl_pipeline_spark.operators.sampling import hash_bucket
from schwab_elt_etl_pipeline_spark.operators.similarity import (
    as_double,
    cosine,
    label_centroid_cells,
)
from schwab_elt_etl_pipeline_spark.operators.tokenize import (
    apply_pair_merges,
    explode_tokens,
    rebuild_docs,
    train_merges,
)
from schwab_elt_etl_pipeline_spark.sources import load_table

# Ordered merge rules — the "trained tokenizer". Chosen from the corpus's
# most frequent adjacent pairs; fixed literals so the query is reproducible
# at every scale factor (a real vocab is equally static at apply time).
MERGES = [("table", "hash"), ("part", "filter"), ("customer", "join")]

_TOKS = r"string_split_regex(TRIM(LOWER(text)), '\s+')"


def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the 3-rule merge list to every document; emit the re-tokenized
    text and its token count. One doc_id shuffle serves all three window
    passes and the final reassembly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = explode_tokens(docs)
    return rebuild_docs(apply_pair_merges(toks, MERGES))


def _merge_pass_sql(i: int, prev: str, a: str, b: str) -> str:
    """One greedy merge pass as chained CTEs (same semantics as
    ``operators/tokenize.py merge_pass``)."""
    return f"""
e{i} AS (
  SELECT doc_id, pos, tok,
         (tok = '{a}' AND lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) = '{b}') AS elig
  FROM {prev}
), r{i} AS (
  SELECT *, (elig AND NOT COALESCE(lag(elig) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)) AS run_start
  FROM e{i}
), g{i} AS (
  SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
  FROM r{i}
), m{i} AS (
  SELECT *, (elig AND ROW_NUMBER() OVER (PARTITION BY doc_id, grp ORDER BY pos) % 2 = 1) AS merged
  FROM g{i}
), k{i} AS (
  SELECT doc_id, pos,
         CASE WHEN merged THEN '{a}_{b}' ELSE tok END AS tok,
         COALESCE(lag(merged) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS absorbed
  FROM m{i}
), t{i} AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos, tok
  FROM k{i} WHERE NOT absorbed
)"""


def _bpe_sql() -> str:
    passes = ",".join(
        _merge_pass_sql(i, f"t{i - 1}" if i else "t0_base", a, b)
        for i, (a, b) in enumerate(MERGES)
    )
    last = f"t{len(MERGES) - 1}"
    return f"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), t0_base AS (
  SELECT doc_id, i AS pos, ts[i] AS tok
  FROM tok, UNNEST(generate_series(1, LEN(ts))) AS g(i)
),{passes}
SELECT doc_id, COUNT(*) AS n_tokens,
       string_agg(tok, ' ' ORDER BY pos) AS text_bpe
FROM {last} GROUP BY doc_id
"""


BPE_APPLY_SQL = _bpe_sql()


# ---------------------------------------------------------------------------
# Iterative BPE training: the full learn loop (count -> argmax -> merge)^k
# ---------------------------------------------------------------------------

_N_TRAIN_MERGES = 6


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``_N_TRAIN_MERGES`` BPE merge rules from the corpus:
    each iteration counts adjacent token pairs corpus-wide (map-side
    combinable), takes the argmax pair (ties (lhs, rhs) ascending), and
    greedily rewrites every occurrence before re-counting — so later rules
    can and do involve tokens produced by earlier rules. Emits the learned
    merge table (step, lhs, rhs, freq-at-selection, merged token).

    The only driver-side state per iteration is the single winning pair —
    at 100 TB each round is one pair-count shuffle plus a window pass on
    the existing doc_id partitioning (``operators/tokenize.py
    train_merges``). The DuckDB oracle certifies the loop end-to-end with
    k *unrolled* CTE steps, each selecting its own winner in SQL — the
    sequential reference recursion against the distributed loop."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    learned, _ = train_merges(explode_tokens(docs), _N_TRAIN_MERGES)
    out = spark.createDataFrame(
        learned, "step int, lhs string, rhs string, freq bigint"
    )
    return out.select(
        "step", "lhs", "rhs", "freq",
        F.concat_ws("_", "lhs", "rhs").alias("token"),
    )


def _train_step_sql(i: int, prev: str) -> str:
    """One learn iteration as chained CTEs: select the winning pair from
    ``prev`` (p{i}), then the same greedy merge pass as ``_merge_pass_sql``
    with the pair coming from scalar subqueries instead of literals."""
    lhs, rhs = f"(SELECT lhs FROM p{i})", f"(SELECT rhs FROM p{i})"
    return f"""
p{i} AS MATERIALIZED (
  SELECT tok AS lhs, nxt AS rhs, COUNT(*) AS freq
  FROM (SELECT tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM {prev})
  WHERE nxt IS NOT NULL
  GROUP BY tok, nxt
  ORDER BY freq DESC, lhs ASC, rhs ASC
  LIMIT 1
), e{i} AS MATERIALIZED (
  SELECT doc_id, pos, tok,
         (tok = {lhs} AND lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) = {rhs}) AS elig
  FROM {prev}
), r{i} AS MATERIALIZED (
  SELECT *, (elig AND NOT COALESCE(lag(elig) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)) AS run_start
  FROM e{i}
), g{i} AS MATERIALIZED (
  SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
  FROM r{i}
), m{i} AS MATERIALIZED (
  SELECT *, (elig AND ROW_NUMBER() OVER (PARTITION BY doc_id, grp ORDER BY pos) % 2 = 1) AS merged
  FROM g{i}
), k{i} AS MATERIALIZED (
  SELECT doc_id, pos,
         CASE WHEN merged THEN {lhs} || '_' || {rhs} ELSE tok END AS tok,
         COALESCE(lag(merged) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS absorbed
  FROM m{i}
), s{i} AS MATERIALIZED (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS pos, tok
  FROM k{i} WHERE NOT absorbed
)"""


def _bpe_train_sql() -> str:
    steps = ",".join(
        _train_step_sql(i, f"s{i - 1}" if i > 1 else "s0_base")
        for i in range(1, _N_TRAIN_MERGES + 1)
    )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS step, lhs, rhs, freq, lhs || '_' || rhs AS token FROM p{i}"
        for i in range(1, _N_TRAIN_MERGES + 1)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), s0_base AS MATERIALIZED (
  SELECT doc_id, i AS pos, ts[i] AS tok
  FROM tok, UNNEST(generate_series(1, LEN(ts))) AS g(i)
),{steps}
{selects}
ORDER BY step
"""


BPE_TRAIN_SQL = _bpe_train_sql()


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, one row per (label, dim).

    Elementwise mean from exact DECIMAL sums over a posexplode — the
    aggregation is map-side combinable and order-independent, so the
    centroid is bit-reproducible (the property that makes seeded k-means /
    IVF training and class-prototype dedup auditable). At 100 TB this is
    one shuffle of (label, dim) partial sums — never of vectors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroid_cells(emb).select(
        "label", F.col("dim").cast("int").alias("dim"), "n", "centroid"
    )


CENTROIDS_SQL = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
), x AS (
  SELECT label, i AS dim, v[i] AS x
  FROM e, UNNEST(generate_series(1, LEN(v))) AS g(i)
)
SELECT label, CAST(dim AS INT) AS dim, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS centroid
FROM x GROUP BY label, dim
"""


def embedding_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side curation flagship, ONE oracle-checked query: semantic
    near-dup verdicts (SemDeDup id-band generator) → class centroids over
    the SURVIVORS only → prototype-distance outlier gate → final verdict
    cascade with reasons.

    The three stages compose the round's embedding operators end-to-end the
    way a real corpus pass runs them: dedup first (so duplicate mass cannot
    drag the prototype), centroids from exact decimal sums (reproducible),
    then a broadcast join of ≤|labels| centroid vectors back onto the
    survivors. Reasons are a fixed priority cascade (near_dup > outlier >
    keep), mirroring ``corpus_curation_e2e`` on the text side.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    verdicts = semantic_dedup_verdicts(emb, band=20, threshold=0.3)
    labeled = emb.select("vec_id", "label", as_double("embedding").alias("v"))
    kept = labeled.join(
        verdicts.filter(F.col("kept") == 1).select("vec_id"),
        "vec_id",
        "left_semi",
    )
    cent_cells = label_centroid_cells(kept, vec_col="v").select(
        "label", "dim", F.col("centroid").alias("c")
    )
    cent = cent_cells.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))),
            lambda s: s["c"],
        ).alias("cvec")
    )
    scored = kept.join(F.broadcast(cent), "label").select(
        "vec_id",
        F.round(cosine(F.col("v"), F.col("cvec")), 6).alias("cos_centroid"),
    )
    return (
        verdicts.join(labeled.select("vec_id", "label"), "vec_id")
        .join(scored, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            "max_cos",
            "cos_centroid",
            F.when(F.col("kept") == 0, F.lit("near_dup"))
            .when(F.col("cos_centroid") < 0.05, F.lit("outlier"))
            .otherwise(F.lit("keep"))
            .alias("reason"),
        )
    )


_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

EMB_CURATION_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         ROUND({_COS.format(a="a.v", b="b.v")}, 6) AS cos
  FROM e a JOIN e b ON b.vec_id > a.vec_id AND b.vec_id - a.vec_id <= 20
  WHERE ROUND({_COS.format(a="a.v", b="b.v")}, 6) >= 0.3
), d AS (
  SELECT b_id, MIN(a_id) AS dup_of, MAX(cos) AS max_cos FROM pairs GROUP BY b_id
), verdicts AS (
  SELECT e.vec_id, e.label, e.v,
         CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS kept,
         COALESCE(d.max_cos, 0.0) AS max_cos
  FROM e LEFT JOIN d ON d.b_id = e.vec_id
), cent_cells AS (
  SELECT label, i AS dim,
         ROUND(CAST(SUM(CAST(v[i] AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS c
  FROM verdicts, UNNEST(generate_series(1, LEN(v))) AS g(i)
  WHERE kept = 1
  GROUP BY label, i
), cent AS (
  SELECT label, list(c ORDER BY dim) AS cvec FROM cent_cells GROUP BY label
), scored AS (
  SELECT k.vec_id, ROUND({_COS.format(a="k.v", b="c.cvec")}, 6) AS cos_centroid
  FROM verdicts k JOIN cent c USING (label) WHERE k.kept = 1
)
SELECT v.vec_id, v.label, v.max_cos, s.cos_centroid,
       CASE WHEN v.kept = 0 THEN 'near_dup'
            WHEN s.cos_centroid < 0.05 THEN 'outlier'
            ELSE 'keep' END AS reason
FROM verdicts v LEFT JOIN scored s ON s.vec_id = v.vec_id
"""


_ALPHA_TEMP = 0.5  # temperature exponent: p_i ∝ n_i^0.5
_TARGET_SHARE = 0.4  # materialize 40% of the corpus overall


def semantic_decontam_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: vectors with
    ``vec_id % 29 == 0`` play the held-out eval set; any training vector
    whose exact cosine to an eval anchor reaches 0.35 is contaminated —
    the semantic complement of ``decontam_ngram_overlap`` (exact grams)
    and ``decontam_fuzzy_minhash`` (lexical near-dup), catching the
    paraphrase/translation leakage token rules miss. Corpus x
    broadcast(eval) exhaustive scan (the production shape for a small
    eval set — linear in the corpus, no recall caveat to certify), exact
    6-digit cosines. Core in ``operators/curation.py``
    ``semantic_decontam``."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    is_eval = F.col("vec_id") % 29 == 0
    return semantic_decontam(
        emb.filter(~is_eval), emb.filter(is_eval), threshold=0.35
    )


SEMANTIC_DECONTAM_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ev AS (SELECT * FROM e WHERE vec_id % 29 = 0),
tr AS (SELECT * FROM e WHERE vec_id % 29 <> 0),
hits AS (
  SELECT a.vec_id, ROUND({_COS.format(a="a.v", b="b.v")}, 6) AS c
  FROM tr a, ev b
  WHERE ROUND({_COS.format(a="a.v", b="b.v")}, 6) >= 0.35
)
SELECT vec_id, MAX(c) AS max_cos, COUNT(*) AS n_hits
FROM hits GROUP BY vec_id
"""


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (multilingual-LM style): source i
    contributes proportionally to n_i^α instead of n_i, up-weighting small
    sources (α < 1 flattens the source distribution; α=1 is proportional,
    α=0 uniform). Per-source sampling rates derive from one tiny count
    table (windows over |sources| rows), and membership is the engine's
    deterministic hash-mod draw — so the exact document set is reproducible
    and oracle-checkable, unlike rand()-based sampleBy.

    Output: the sampled (source, doc_id) rows plus the per-mill rate that
    admitted them.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    rates = counts.select(
        "source",
        "n",
        F.least(
            F.lit(1000),
            F.round(
                F.lit(_TARGET_SHARE)
                * F.sum("n").over(w_all)
                * (
                    F.pow(F.col("n"), _ALPHA_TEMP)
                    / F.sum(F.pow(F.col("n"), _ALPHA_TEMP)).over(w_all)
                )
                / F.col("n")
                * 1000
            ).cast("int"),
        ).alias("rate_permill"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(hash_bucket("doc_id", 1000) < F.col("rate_permill"))
        .select("source", "doc_id", "rate_permill")
    )


CORPUS_TEMP_MIX_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), rates AS (
  SELECT source, n,
         LEAST(1000, CAST(ROUND(
           {_TARGET_SHARE} * SUM(n) OVER ()
           * (pow(n, {_ALPHA_TEMP}) / SUM(pow(n, {_ALPHA_TEMP})) OVER ())
           / n * 1000) AS INT)) AS rate_permill
  FROM counts
)
SELECT d.source, d.doc_id, r.rate_permill
FROM documents d JOIN rates r USING (source)
WHERE ((d.doc_id % 1000003) * 2654435761) % 999983 % 1000 < r.rate_permill
"""


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer trainer: one EM round
# ---------------------------------------------------------------------------


def unigram_lm_em_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One unigram-LM EM round over the corpus vocabulary — the
    SentencePiece-style counterpart of the iterative BPE trainer.

    E-step: every distinct word (weighted by corpus frequency — the
    standard per-type trick) is Viterbi-segmented over the bounded-length
    subword lattice seeded from substring counts; the objective is the
    exact-integer lexicographic surrogate (fewest pieces, then
    most-frequent pieces, then reversed-length-sequence order) documented
    on ``operators/tokenize.py viterbi_segment``. M-step: piece counts
    renormalize from the chosen segmentations. Output: the retrained
    (piece, em_cnt, p_ppm) table.

    The DuckDB oracle is the STRONG form: it enumerates EVERY legal
    segmentation of every word with a recursive CTE and takes the same
    lexicographic argmin — brute-force certification of the distributed
    DP, the same discipline as the brute-force-Jaccard oracle certifying
    LSH recall. Scale shape: per-row higher-order expressions (no UDF, no
    shuffle inside the DP), broadcast vocabulary, vocabulary-sized
    aggregations; corpus size enters only through integer weights.
    """
    from schwab_elt_etl_pipeline_spark.operators.tokenize import unigram_em_round

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter((F.length("word") >= 1) & (F.length("word") <= 16))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return unigram_em_round(words, max_piece_len=4, min_count=2)


def unigram_lm_em_iterated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO chained unigram-LM EM rounds with in-loop vocabulary pruning:
    round 2 re-segments against round 1's M-step counts (unused pieces
    drop out; single characters persist at count 0 so every word stays
    segmentable — the SentencePiece pruning rule). The oracle chains two
    brute-force enumeration rounds, the second against the first's
    renormalized vocabulary — certifying that the loop actually iterates
    (the ``bpe_train_merges`` discipline, here with a per-row DP instead
    of driver round-trips)."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import unigram_em_round

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter((F.length("word") >= 1) & (F.length("word") <= 16))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return unigram_em_round(words, max_piece_len=4, min_count=2, rounds=2)


_EM_SEED_CTES = rf"""tok AS (
  SELECT UNNEST({_TOKS}) AS word FROM documents
), words AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM tok
  WHERE LEN(word) BETWEEN 1 AND 16 GROUP BY word
), occ AS (
  SELECT SUBSTRING(w.word, i - l + 1, l) AS piece, w.freq
  FROM words w,
       UNNEST(generate_series(1, LEN(w.word))) AS gi(i),
       UNNEST(generate_series(1, LEAST(4, i))) AS gl(l)
), vocab AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM occ GROUP BY piece
  HAVING LEN(piece) = 1 OR SUM(freq) >= 2
)"""


def _em_round_sql(i: int, vocab: str) -> str:
    """One EM round as chained CTEs: brute-force enumeration of every legal
    segmentation against ``vocab`` (recursive CTE), the operator's
    lexicographic argmin, then the M-step counts."""
    return f"""
r{i}(word, freq, pos, k, s, lens, ps) AS (
  SELECT word, freq, 0, 0, CAST(0 AS BIGINT),
         CAST([] AS INT[]), CAST([] AS VARCHAR[])
  FROM words
  UNION ALL
  SELECT r{i}.word, r{i}.freq, r{i}.pos + l.l, r{i}.k + 1, r{i}.s + v.cnt,
         list_append(r{i}.lens, l.l), list_append(r{i}.ps, v.piece)
  FROM r{i}
  JOIN (VALUES (1), (2), (3), (4)) AS l(l) ON r{i}.pos + l.l <= LEN(r{i}.word)
  JOIN {vocab} v ON v.piece = SUBSTRING(r{i}.word, r{i}.pos + 1, l.l)
), best{i} AS MATERIALIZED (
  SELECT word, freq, ps,
         ROW_NUMBER() OVER (
           PARTITION BY word ORDER BY k ASC, s DESC, list_reverse(lens) ASC
         ) AS rn
  FROM r{i} WHERE pos = LEN(word)
), counts{i} AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS em_cnt
  FROM (SELECT UNNEST(ps) AS piece, freq FROM best{i} WHERE rn = 1)
  GROUP BY piece
)"""


def _em_final_sql(i: int) -> str:
    return f"""
tot AS (SELECT CAST(SUM(em_cnt) AS BIGINT) AS total FROM counts{i})
SELECT piece, em_cnt,
       CAST(em_cnt AS DOUBLE) / CAST(total AS DOUBLE) * 1000000.0 AS p_ppm
FROM counts{i} CROSS JOIN tot
"""


UNIGRAM_EM_SQL = f"""
WITH RECURSIVE {_EM_SEED_CTES},{_em_round_sql(1, "vocab")},{_em_final_sql(1)}
"""


def wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match-first WordPiece apply (the BERT rule) over the
    corpus vocabulary: word-initial pieces keep their surface form,
    continuation pieces carry ``##``; at every position the walk consumes
    the longest matching piece. Completes tokenizer-family apply symmetry
    (BPE merge cascade, unigram Viterbi, WordPiece greedy) — per-TYPE
    segmentation, broadcast vocabulary, the whole walk ONE higher-order
    aggregate. The oracle replays the greedy walk step-for-step with a
    recursive CTE over the identical match table. Core in
    ``operators/tokenize.py wordpiece_segment``."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import (
        wordpiece_segment,
        wordpiece_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter((F.length("word") >= 1) & (F.length("word") <= 16))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    seg = wordpiece_segment(words, wordpiece_vocab(words, 4, 2), max_piece_len=4)
    return seg.select(
        "word",
        F.array_join("pieces", " ").alias("wp_text"),
        "n_pieces",
        F.col("is_unk").cast("int").alias("is_unk"),
    )


WORDPIECE_SQL = rf"""
WITH RECURSIVE tok AS (
  SELECT UNNEST({_TOKS}) AS word FROM documents
), words AS MATERIALIZED (
  SELECT word, COUNT(*) AS freq FROM tok
  WHERE LEN(word) BETWEEN 1 AND 16 GROUP BY word
), wocc AS (
  SELECT CASE WHEN i - l + 1 = 1 THEN SUBSTRING(w.word, i - l + 1, l)
              ELSE '##' || SUBSTRING(w.word, i - l + 1, l) END AS piece,
         l AS base_len, w.freq
  FROM words w,
       UNNEST(generate_series(1, LEN(w.word))) AS gi(i),
       UNNEST(generate_series(1, LEAST(4, i))) AS gl(l)
), wpvocab AS MATERIALIZED (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM wocc GROUP BY piece
  HAVING MAX(base_len) = 1 OR SUM(freq) >= 2
), cand AS (
  SELECT w.word, i - l + 1 AS i0, l,
         CASE WHEN i - l + 1 = 1 THEN SUBSTRING(w.word, i - l + 1, l)
              ELSE '##' || SUBSTRING(w.word, i - l + 1, l) END AS form
  FROM words w,
       UNNEST(generate_series(1, LEN(w.word))) AS gi(i),
       UNNEST(generate_series(1, LEAST(4, i))) AS gl(l)
), m AS MATERIALIZED (
  SELECT cand.word, cand.i0, MAX(cand.l) AS lm
  FROM cand JOIN wpvocab v ON v.piece = cand.form
  GROUP BY cand.word, cand.i0
), walk(word, pos, wp, np, ok) AS (
  SELECT word, 1, CAST('' AS VARCHAR), 0, TRUE FROM words
  UNION ALL
  SELECT w.word,
         CASE WHEN m.lm IS NULL THEN LEN(w.word) + 1 ELSE w.pos + m.lm END,
         CASE WHEN m.lm IS NULL THEN w.wp
              ELSE w.wp || CASE WHEN w.pos = 1 THEN '' ELSE ' ' END ||
                   CASE WHEN w.pos = 1 THEN SUBSTRING(w.word, w.pos, m.lm)
                        ELSE '##' || SUBSTRING(w.word, w.pos, m.lm) END END,
         CASE WHEN m.lm IS NULL THEN w.np ELSE w.np + 1 END,
         m.lm IS NOT NULL
  FROM walk w LEFT JOIN m ON m.word = w.word AND m.i0 = w.pos
  WHERE w.pos <= LEN(w.word) AND w.ok
)
SELECT word,
       CASE WHEN ok THEN wp ELSE '[UNK]' END AS wp_text,
       CASE WHEN ok THEN np ELSE 1 END AS n_pieces,
       CASE WHEN ok THEN 0 ELSE 1 END AS is_unk
FROM walk WHERE pos = LEN(word) + 1
"""

# round-2 vocabulary: the previous M-step's counts, plus unused single
# characters at count 0 (always segmentable — the SentencePiece pruning rule)
_VOCAB2_CTE = """
vocab2 AS MATERIALIZED (
  SELECT piece, em_cnt AS cnt FROM counts1
  UNION ALL
  SELECT v.piece, CAST(0 AS BIGINT) AS cnt FROM vocab v
  WHERE LEN(v.piece) = 1
    AND v.piece NOT IN (SELECT piece FROM counts1)
)"""

UNIGRAM_EM2_SQL = f"""
WITH RECURSIVE {_EM_SEED_CTES},{_em_round_sql(1, "vocab")},{_VOCAB2_CTE},{_em_round_sql(2, "vocab2")},{_em_final_sql(2)}
"""


def unigram_lm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained unigram tokenizer to the corpus — the unigram twin
    of ``bpe_apply_merges``, completing train/apply symmetry for both
    tokenizer families: one EM round trains the vocabulary, then every
    document re-tokenizes by per-TYPE Viterbi segmentation (distinct words
    segment once; documents join the result and rebuild in position
    order). The oracle chains the enumeration-certified training round
    with a second enumeration under the trained vocabulary and the same
    position-ordered string rebuild."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import (
        pruned_vocab,
        seed_subword_vocab,
        unigram_em_round,
        unigram_tokenize_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
        )
        .filter((F.length("word") >= 1) & (F.length("word") <= 16))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    trained = unigram_em_round(words, max_piece_len=4, min_count=2)
    ones = (
        seed_subword_vocab(words, max_piece_len=4, min_count=2)
        .filter(F.length("piece") == 1)
        .select("piece")
    )
    return unigram_tokenize_docs(docs, pruned_vocab(trained, ones))


UNIGRAM_TOKENIZE_SQL = f"""
WITH RECURSIVE {_EM_SEED_CTES},{_em_round_sql(1, "vocab")},{_VOCAB2_CTE},{_em_round_sql(2, "vocab2")},
docd AS (
  SELECT doc_id, {_TOKS} AS t FROM documents
), docw AS (
  SELECT doc_id, i AS pos, t[i] AS word
  FROM docd, UNNEST(generate_series(1, LEN(t))) AS g(i)
)
SELECT w.doc_id,
       COUNT(*) AS n_words,
       CAST(SUM(LEN(COALESCE(b.ps, [w.word]))) AS BIGINT) AS n_pieces,
       string_agg(array_to_string(COALESCE(b.ps, [w.word]), ' '), ' '
                  ORDER BY w.pos) AS text_seg
FROM docw w
LEFT JOIN (SELECT word, ps FROM best2 WHERE rn = 1) b ON w.word = b.word
GROUP BY w.doc_id
"""


SPECS = [
    QuerySpec(
        "unigram_lm_em_round", unigram_lm_em_round, UNIGRAM_EM_SQL,
        doc="unigram-LM (SentencePiece-style) EM round: lattice Viterbi "
            "E-step + count-renormalization M-step, certified against "
            "brute-force segmentation enumeration",
    ),
    QuerySpec(
        "unigram_lm_em_iterated", unigram_lm_em_iterated, UNIGRAM_EM2_SQL,
        doc="two chained unigram-LM EM rounds with in-loop vocabulary "
            "pruning, certified against two chained enumeration rounds",
    ),
    QuerySpec(
        "unigram_lm_tokenize", unigram_lm_tokenize, UNIGRAM_TOKENIZE_SQL,
        doc="unigram tokenizer APPLY: per-type Viterbi segmentation under "
            "the trained vocabulary, position-ordered document rebuild",
    ),
    QuerySpec(
        "wordpiece_tokenize", wordpiece_tokenize, WORDPIECE_SQL,
        doc="WordPiece greedy longest-match apply (##-continuation pieces), "
            "oracle replays the walk with a recursive CTE",
    ),
    QuerySpec(
        "bpe_apply_merges", bpe_apply_merges, BPE_APPLY_SQL,
        headline=True,
        doc="BPE-style greedy merge-rule application over the corpus "
            "(one doc shuffle, M window passes)",
    ),
    QuerySpec(
        "bpe_train_merges", bpe_train_merges, BPE_TRAIN_SQL, headline=True,
        doc="iterative BPE training loop: k x (pair count -> argmax -> "
            "greedy merge), certified against k unrolled CTE steps",
    ),
    QuerySpec(
        "embedding_label_centroids", embedding_label_centroids, CENTROIDS_SQL,
        doc="per-label embedding centroids from exact decimal sums",
    ),
    QuerySpec(
        "corpus_temperature_mix", corpus_temperature_mix, CORPUS_TEMP_MIX_SQL,
        doc="temperature-based (n^alpha) source mixing via deterministic hash draw",
    ),
    QuerySpec(
        "semantic_decontam_select", semantic_decontam_select, SEMANTIC_DECONTAM_SQL,
        doc="embedding-space benchmark decontamination: corpus x broadcast "
            "eval anchors, exact cosine >= 0.35 verdicts",
    ),
    QuerySpec(
        "embedding_curation_e2e", embedding_curation_e2e, EMB_CURATION_SQL,
        headline=True,
        doc="embedding curation flagship: semantic dedup -> survivor "
            "centroids -> prototype-distance outlier gate",
    ),
]
