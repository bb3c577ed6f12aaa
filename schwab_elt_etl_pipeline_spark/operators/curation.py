"""Corpus-curation operators for LLM training-data pipelines.

Four capabilities a 100 TB curation job runs between raw crawl and tokenizer:

- **Benchmark decontamination** — flag training documents whose word n-grams
  overlap an evaluation set (the standard train/test-contamination guard).
  The eval gram set is tiny relative to the corpus (10^4-10^6 grams vs 10^9
  docs), so membership is a broadcast hash join against the exploded training
  grams: corpus-side work stays linear, no shuffle of the corpus.
- **Repetition statistics** (Gopher-style quality rules) — per-document
  top-token fraction, distinct-token ratio, duplicate-2-gram fraction. The
  per-(doc, token) counts are a map-side-combinable aggregation keyed by
  doc_id, so they never shuffle more than one row per distinct (doc, token).
- **PII scrubbing** — regex redaction of emails / US phone numbers / SSNs
  with per-type match counts. Pure JVM ``regexp_replace``/``regexp_count``
  expressions (no UDFs), so the scrub inlines into whole-stage codegen.
- **Semantic (embedding) dedup** — SemDeDup-shaped keep/drop verdicts: a
  document is dropped when a lower-id neighbor in its candidate block has
  cosine ≥ threshold. Blocking here is the id band used by the exact-pair
  oracle; at scale the same shape runs over sign-LSH / IVF buckets
  (operators/similarity.py) — only the candidate generator changes.

The reference repo has no corpus operators (it is a market-data ELT,
README.md:3); this module is part of the engine's LLM-data extension surface
(BASELINE.json north-star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.dedup import (
    jaccard,
    minhash_cross_candidates,
    split_passages,
    with_shingles,
)
from schwab_elt_etl_pipeline_spark.operators.similarity import (
    as_double,
    cosine,
    sign_bucket,
)

# ---------------------------------------------------------------------------
# Decontamination
# ---------------------------------------------------------------------------


def _exploded_shingles(
    df: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """Explode shingles from a MATERIALIZED array.

    Generate fused over a lambda-built array re-evaluates the interpreted
    lambda (higher-order functions don't codegen) once per EMITTED element —
    O(tokens²) per document, measured 30x slower than exploding a
    materialized column. The lazy localCheckpoint pins the array to one
    evaluation per row; its cost is a narrow columnar copy of (keep, grams).
    """
    sh = (
        with_shingles(df, text_col, n)
        .select(*keep, "grams")
        .localCheckpoint(eager=False)
    )
    return sh.select(*keep, F.explode("grams").alias("gram"))


def eval_gram_set(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams of an evaluation corpus → one ``gram`` column.

    Small by construction (eval sets are ≤ 10^5 documents); the caller
    broadcasts it against the training corpus.
    """
    return _exploded_shingles(docs, text_col, n, keep=[]).distinct()


def decontaminate(
    train: DataFrame,
    eval_grams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document n-gram overlap against an eval gram set.

    Output: (id, n_grams, n_hit, overlap, contaminated) — ``overlap`` is the
    fraction of the document's DISTINCT n-grams that appear anywhere in the
    eval set; docs shorter than n tokens get overlap 0.0. One explode + one
    broadcast join + one aggregation: linear in corpus size.
    """
    exploded = _exploded_shingles(train, text_col, n, keep=[id_col])
    per = (
        exploded.join(
            F.broadcast(eval_grams.withColumn("_hit", F.lit(1))), "gram", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hit"),
        )
    )
    # join back so zero-gram documents keep a row (explode drops them)
    base = train.select(id_col)
    out = base.join(per, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
    )
    overlap = F.when(
        F.col("n_grams") > 0, F.col("n_hit") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "n_grams",
        "n_hit",
        F.round(overlap, 6).alias("overlap"),
        (overlap >= threshold).cast("int").alias("contaminated"),
    )


def decontaminate_fuzzy(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 2,
    k: int = 32,
    bands: int = 16,
    tau: float = 0.5,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag training documents that NEAR-
    duplicate an eval document (exact n-gram overlap misses light rewrites;
    this is the MinHash twin the big crawls run alongside `decontaminate`).

    Cross-table LSH-then-verify: banded MinHash buckets propose
    (train, eval) candidates — an equi-join on (band, bucket) with the tiny
    eval side broadcast, so the corpus never shuffles — then exact Jaccard
    ≥ tau over candidates is the verdict. Output keeps EVERY train row:
    (id, n_matches, best_eval_id, best_jac, contaminated), with the best
    match ranked by (jac desc, eval_id asc) for determinism. Same recall
    certificate as `minhash_verified_pairs`: the brute-force oracle hash
    match certifies the LSH stage missed nothing.
    """
    cands = minhash_cross_candidates(
        train, evalset, id_col=id_col, text_col=text_col, ngram=ngram, k=k, bands=bands
    ).select("left_id", "right_id")
    sh_t = with_shingles(train, text_col, ngram, out="grams").select(
        F.col(id_col).alias("left_id"), F.col("grams").alias("t_grams")
    )
    sh_e = with_shingles(evalset, text_col, ngram, out="grams").select(
        F.col(id_col).alias("right_id"), F.col("grams").alias("e_grams")
    )
    hits = (
        cands.join(sh_t, "left_id")
        .join(F.broadcast(sh_e), "right_id")
        .select(
            "left_id",
            "right_id",
            F.round(jaccard(F.col("t_grams"), F.col("e_grams")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= tau)
    )
    best = hits.groupBy("left_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.max(F.struct(F.col("jac"), (-F.col("right_id")).alias("neg_id"))).alias("_b"),
    )
    return (
        train.select(F.col(id_col).alias("left_id"))
        .join(best, "left_id", "left")
        .select(
            F.col("left_id").alias(id_col),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
            F.coalesce(-F.col("_b.neg_id"), F.lit(-1)).cast("bigint").alias("best_eval_id"),
            F.coalesce(F.col("_b.jac"), F.lit(0.0)).alias("best_jac"),
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality rules)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_token_max: float = 0.2,
    dup_2gram_max: float = 0.3,
) -> DataFrame:
    """Per-document repetition signals with a keep/drop flag.

    Output: (id, n_tokens, distinct_ratio, top_token_frac, dup_2gram_frac,
    repetitive). Token counts aggregate per (doc, token) first — map-side
    combine keeps the shuffle at one row per distinct token per doc.
    """
    toks = df.select(
        id_col,
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    )
    per_token = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    stats = per_token.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    grams = with_shingles(df, text_col, 2).select(
        id_col, F.size("grams").alias("d2")
    )
    j = stats.join(grams, id_col)
    t2 = F.greatest(F.col("n_tokens") - 1, F.lit(0).cast("long"))
    dup_frac = F.when(t2 > 0, 1.0 - F.col("d2") / t2).otherwise(F.lit(0.0))
    top_frac = F.col("top_c") / F.col("n_tokens")
    return j.select(
        id_col,
        "n_tokens",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        F.round(top_frac, 6).alias("top_token_frac"),
        F.round(dup_frac, 6).alias("dup_2gram_frac"),
        ((top_frac > top_token_max) | (dup_frac > dup_2gram_max))
        .cast("int")
        .alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Patterns chosen for identical semantics in Java regex (Spark) and RE2
# (DuckDB oracle): no backrefs, no lookaround, ASCII word boundaries only.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"


def pii_counts(text: Column | str) -> list[Column]:
    """Match counts per PII type: (n_email, n_phone, n_ssn)."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(c, F.lit(SSN_RE)).alias("n_ssn"),
    ]


def pii_redact(text: Column | str) -> Column:
    """Replace every email/phone/SSN occurrence with a typed placeholder.

    SSNs redact before phones (both are digit-dash shapes; distinct widths
    keep them non-overlapping, the order makes that explicit).
    """
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, SSN_RE, "<SSN>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-shaped)
# ---------------------------------------------------------------------------


def semantic_dedup_verdicts(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    band: int = 20,
    threshold: float = 0.3,
) -> DataFrame:
    """Keep/drop verdicts: drop a vector when a LOWER-id vector within the
    candidate band has cosine ≥ threshold (keep-first retention).

    Output: (id, kept, dup_of, max_cos) — ``dup_of`` is the smallest similar
    lower-id candidate, which may itself have been dropped (-1 when kept);
    ``max_cos`` the strongest match (0.0 when kept). The id band is the
    oracle-exact candidate generator, turned into an equi-join: ids bucket by
    the band width and the left side probes its own and the next bucket, so
    candidates stay linear in band width (a bare band predicate would plan a
    nested-loop join — quadratic at scale). The 100 TB candidate generator is
    :func:`semantic_dedup_lsh_verdicts` (multi-table sign-LSH buckets).
    """
    bucket = F.floor(F.col(id_col) / band)
    a = emb.select(
        F.col(id_col).alias("a_id"),
        as_double(vec_col).alias("a_vec"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = emb.select(
        F.col(id_col).alias("b_id"),
        as_double(vec_col).alias("b_vec"),
        bucket.alias("bucket"),
    )
    pairs = (
        a.join(b, on="bucket")
        .filter(
            (F.col("b_id") > F.col("a_id"))
            & (F.col("b_id") - F.col("a_id") <= band)
        )
        .select(
            "a_id",
            "b_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return _verdicts_from_pairs(emb, id_col, pairs)


def _verdicts_from_pairs(emb: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Keep-first verdict tail shared by all candidate generators: reduce
    similar pairs to per-victim (dup_of, max_cos), left-join back to the full
    vector set."""
    dropped = pairs.groupBy("b_id").agg(
        F.min("a_id").alias("dup_of"), F.max("cos").alias("max_cos")
    )
    return (
        emb.select(F.col(id_col))
        .join(dropped, F.col(id_col) == F.col("b_id"), "left")
        .select(
            id_col,
            F.when(F.col("dup_of").isNull(), 1).otherwise(0).alias("kept"),
            F.coalesce("dup_of", F.lit(-1)).alias("dup_of"),
            F.coalesce("max_cos", F.lit(0.0)).alias("max_cos"),
        )
    )


def semantic_dedup_lsh_verdicts(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    tables: int = 4,
    threshold: float = 0.3,
) -> DataFrame:
    """Semantic dedup over MULTI-TABLE sign-LSH buckets — the 100 TB
    candidate generator (SemDeDup keep/drop without an id band).

    Table t buckets each vector by the sign pattern of embedding components
    [t·bits+1, (t+1)·bits] (random-hyperplane LSH with axis-aligned planes);
    a pair is a candidate when ANY table's bucket matches, so recall improves
    geometrically with ``tables`` while each table keeps 2^bits-way
    selectivity. The only shuffle is the (table, bucket) equi-join — the
    corpus never self-cross-joins, and candidates per vector are
    ~tables·N/2^bits.

    Axis-aligned planes keep the blocking deterministic AND SQL-expressible,
    so the whole verdict — candidate generation included — is oracle-checked
    in DuckDB (stronger than a recall gate; the oracle recomputes the same
    buckets). Output schema matches :func:`semantic_dedup_verdicts`.
    """
    v = as_double(vec_col)
    tbl_keys = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                sign_bucket(F.slice(v, t * bits + 1, bits), bits).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    keyed = emb.select(
        F.col(id_col).alias("id"), v.alias("vec"), F.explode(tbl_keys).alias("tb")
    ).select("id", "vec", "tb.t", "tb.bucket")
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .dropDuplicates(["a_id", "b_id"])
    )
    return _verdicts_from_pairs(emb, id_col, pairs)


def boilerplate_scrub(
    docs: DataFrame,
    passage_tokens: int = 2,
    min_docs: int = 10,
    min_docs_per: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet / RefinedWeb line
    rule): a line that recurs across ``min_docs`` or more DISTINCT
    documents is boilerplate (headers, footers, cookie banners) and is
    excised from EVERY document — unlike :func:`~schwab_elt_etl_pipeline_spark.
    operators.dedup.passage_dedup_rebuild`, which keeps the first
    occurrence; boilerplate has no "first" worth keeping.

    Lines are the shared passage definition (``operators/dedup.py
    split_passages`` — non-overlapping ``passage_tokens``-token chunks of
    the normalized text), so this composes with passage dedup without a
    second tokenization rule. ``min_docs_per`` switches the threshold to
    the corpus-relative ``greatest(min_docs, n_docs div min_docs_per)``,
    evaluated in-plan as a 1-row broadcast scalar — the form that stays
    meaningful from a 50-doc test slice to a 100 TB corpus. Output: (id, text, n_lines, n_removed) with
    the text rebuilt from surviving lines in position order (documents
    that lose every line survive with empty text — the caller's length
    gate decides their fate, not this operator).

    Scale shape: one explode + ONE line-keyed distinct-doc count; the
    boilerplate set is at most corpus_lines / min_docs distinct lines
    (Zipf-truncated much further in practice), so the excision anti-join
    is left UNHINTED: AQE sees the post-threshold size and picks a
    broadcast LEFT ANTI when it fits (the common case — the corpus never
    shuffles on the wide text) and degrades to a shuffled hash join on
    the line fingerprint when it doesn't — same semantics, one extra
    exchange, no driver OOM from a forced-broadcast hint. Only the
    genuinely-1-row threshold scalar carries an explicit broadcast hint.

    Reference behavior mirrored: the reference's dup-guards are row-keyed
    (tools/schwab.py:476-520 dup-guard insert); line-level corpus
    frequency is the LLM-training extension the build brief asks for.
    """
    lines = split_passages(docs, id_col, text_col, passage_tokens)
    dfc = lines.groupBy("passage").agg(
        F.count_distinct(F.col("_id")).alias("df")
    )
    if min_docs_per is not None:
        # corpus-relative threshold greatest(min_docs, n_docs div per),
        # computed IN-PLAN as a 1-row broadcast scalar (the
        # tfidf_topk_keywords doc-count pattern) — no driver action.
        thr = docs.agg(F.count(F.lit(1)).alias("_n")).select(
            F.greatest(
                F.lit(min_docs).cast("long"),
                F.expr(f"_n div {int(min_docs_per)}"),
            ).alias("_thr")
        )
        boiler = (
            dfc.crossJoin(F.broadcast(thr))
            .filter(F.col("df") >= F.col("_thr"))
            .select("passage")
        )
    else:
        boiler = dfc.filter(F.col("df") >= min_docs).select("passage")
    # unhinted: AQE broadcasts when the boilerplate set fits, shuffles when
    # it doesn't — a forced F.broadcast() would OOM on an outsized set
    kept = lines.join(boiler, "passage", "left_anti")
    totals = lines.groupBy("_id").agg(F.count(F.lit(1)).alias("n_lines"))
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("passage_id", "passage"))
                ),
                lambda x: x["passage"],
            ),
            " ",
        ).alias("text"),
    )
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("text", F.lit("")).alias(text_col),
            F.col("n_lines"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def semantic_decontam(
    train: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic member of
    the decontamination family (:func:`decontaminate` is exact n-gram,
    :func:`decontaminate_fuzzy` is MinHash): a training vector whose
    cosine to ANY eval-set anchor reaches ``threshold`` is contaminated
    (a paraphrased or translated benchmark item that token-level rules
    miss). Output, contaminated rows only: (id, max_cos, n_hits) — the
    strongest match and how many anchors fired.

    Scale shape: eval sets are small (thousands of benchmark items)
    against an unbounded corpus, so the PRODUCTION-correct plan is the
    brute-force one — corpus x broadcast(eval) nested-loop with exact
    cosine, strictly linear in the corpus with zero shuffle before the
    per-id aggregate (the ``kmeans_assign_fixed`` BNLJ shape, sanctioned
    scalar/tiny-broadcast). No LSH recall question to certify: the
    oracle replays the identical exhaustive scan. Cosines round to 6
    digits (the repo-wide embedding contract) so verdicts hash-match.
    """
    t = train.select(F.col(id_col), as_double(vec_col).alias("_tv"))
    e = eval_vecs.select(
        F.col(id_col).alias("_eid"), as_double(vec_col).alias("_ev")
    )
    return (
        t.crossJoin(F.broadcast(e))
        .select(
            id_col,
            F.round(cosine(F.col("_tv"), F.col("_ev")), 6).alias("_cos"),
        )
        .filter(F.col("_cos") >= threshold)
        .groupBy(id_col)
        .agg(
            F.max("_cos").alias("max_cos"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
