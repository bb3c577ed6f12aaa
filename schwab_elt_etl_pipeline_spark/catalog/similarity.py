"""Similarity-search queries over the ``embeddings`` table.

Both tiers of the ANN family (brute-force exact; sign-LSH bucketed) plus a
banded near-duplicate pair scan. Cosines are rounded to 6 digits on both
engines so floating-point summation differences cannot move the top-k cutoff.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.similarity import (
    as_double,
    brute_force_topk,
    dot,
    bucketed_ann_topk,
    cosine,
    ivf_kmeans_topk,
    projected_rerank_topk,
    projection_signs,
    sign_bucket,
)
from schwab_elt_etl_pipeline_spark.sources import load_table

_N_QUERIES = 3

# DuckDB-side cosine between DOUBLE[] lists (sqrt of self-dot for norms).
_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for the first 3 vectors as queries."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=10
    )


ANN_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS c_vec FROM embeddings
), scored AS (
  SELECT q_id, vec_id,
         ROUND({_COS_SQL.format(a="q_vec", b="c_vec")}, 6) AS cos
  FROM c, q WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) <= 10
"""


def ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (IVF shape): search only the query's bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    return bucketed_ann_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=10, bits=4
    )


_BUCKET_SQL = (
    "(CASE WHEN {v}[1] >= 0 THEN 1 ELSE 0 END"
    " | CASE WHEN {v}[2] >= 0 THEN 2 ELSE 0 END"
    " | CASE WHEN {v}[3] >= 0 THEN 4 ELSE 0 END"
    " | CASE WHEN {v}[4] >= 0 THEN 8 ELSE 0 END)"
)

ANN_BUCKETED_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec,
         {_BUCKET_SQL.format(v="(embedding::DOUBLE[])")} AS bucket
  FROM embeddings WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS c_vec,
         {_BUCKET_SQL.format(v="(embedding::DOUBLE[])")} AS bucket
  FROM embeddings
), scored AS (
  SELECT q_id, vec_id,
         ROUND({_COS_SQL.format(a="q_vec", b="c_vec")}, 6) AS cos
  FROM c JOIN q USING (bucket) WHERE vec_id <> q_id
)
SELECT q_id, vec_id, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) <= 10
"""


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-centroid IVF ANN, certified at verdict level.

    The k-means clustering itself is not SQL-expressible, so the emitted row
    per query is the SQL-expressible *certificate*: the exact top-1 cosine
    (brute force — anchors the scoring math to the DuckDB oracle) plus a
    recall verdict (``recall_ok``: the 4-probe IVF search recovered ≥ 2 of
    the exact top-10). The oracle computes the same top-1 cosine and asserts
    the verdict literally TRUE, so a hash match certifies both the distance
    kernel and a reproducible recall floor (measured 4–10 hits of 10 at
    sf0.001–0.01; threshold 2 leaves 2× margin). Deterministic: seeded
    k-means init + fixed parquet partitioning."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    ivf = ivf_kmeans_topk(emb, q, k=10, n_centroids=16, n_probe=4)
    exact = brute_force_topk(emb, q, k=10)
    hits = (
        exact.join(ivf, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    top1 = exact.groupBy("q_id").agg(F.max("cos").alias("exact_top1_cos"))
    return (
        top1.join(hits, "q_id", "left")
        .select(
            "q_id",
            "exact_top1_cos",
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= 2).alias("recall_ok"),
        )
    )


ANN_IVF_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS c_vec FROM embeddings
), scored AS (
  SELECT q_id, vec_id,
         ROUND({_COS_SQL.format(a="q_vec", b="c_vec")}, 6) AS cos
  FROM c, q WHERE vec_id <> q_id
)
SELECT q_id, MAX(cos) AS exact_top1_cos, TRUE AS recall_ok
FROM scored GROUP BY q_id
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, banded by id delta ≤ 20."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a_id"), as_double("embedding").alias("a_vec"))
    b = emb.select(F.col("vec_id").alias("b_id"), as_double("embedding").alias("b_vec"))
    return (
        a.join(
            b,
            (F.col("b_id") > F.col("a_id")) & (F.col("b_id") - F.col("a_id") <= 20),
        )
        .select(
            "a_id",
            "b_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= 0.3)
    )


EMBEDDING_NEAR_DUP_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       ROUND({_COS_SQL.format(a="a.v", b="b.v")}, 6) AS cos
FROM e a JOIN e b ON b.vec_id > a.vec_id AND b.vec_id - a.vec_id <= 20
WHERE ROUND({_COS_SQL.format(a="a.v", b="b.v")}, 6) >= 0.3
"""


def ann_projected_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-then-refine ANN: coarse top-40 in an 8-d ±1 random-projection
    sketch space, exact cosine re-rank to top-10. Both stages deterministic
    (literal sign matrix, rounded scores, id tiebreaks) — the fully
    oracle-checkable member of the ANN family, where the coarse pass reads
    1/8 of the vector bytes and the exact kernel touches 40/N of the corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    return projected_rerank_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), k=10, n_candidates=40
    )


_SIGN_LISTS = [
    "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in row) + "]"
    for row in projection_signs(8, 64)
]
_PROJ_SQL = (
    "[" + ", ".join(f"list_dot_product(v, {row})" for row in _SIGN_LISTS) + "]"
)

ANN_PROJECTED_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), pr AS (
  SELECT vec_id, v, {_PROJ_SQL} AS p FROM base
), q AS (
  SELECT vec_id AS q_id, v AS q_vec, p AS q_p FROM pr WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id, v AS c_vec, p AS c_p FROM pr
), coarse AS (
  SELECT q_id, vec_id, q_vec, c_vec,
         ROUND(list_dot_product(q_p, c_p), 6) AS coarse
  FROM c, q WHERE vec_id <> q_id
), cand AS (
  SELECT q_id, vec_id, q_vec, c_vec FROM coarse
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY coarse DESC, vec_id ASC) <= 40
), rer AS (
  SELECT q_id, vec_id,
         ROUND({_COS_SQL.format(a="q_vec", b="c_vec")}, 6) AS cos
  FROM cand
)
SELECT q_id, vec_id, cos FROM rer
QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) <= 10
"""


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hardest negative per anchor: the highest-cosine vector with a
    DIFFERENT label inside the anchor's sign-LSH bucket — the contrastive-
    training mining step (hard negatives dominate InfoNCE gradient quality).

    The bucket equi-join bounds candidates to the anchor's cell, so mining
    cost is O(N²/2^bits) spread across co-partitioned cells instead of the
    all-pairs O(N²); at 100 TB the same plan runs per bucket shard. Ties
    break by candidate id; rounded cosines pin the winner across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        as_double("embedding").alias("a_vec"),
    ).withColumn("bucket", sign_bucket(F.col("a_vec"), 4))
    b = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("b_label"),
        as_double("embedding").alias("b_vec"),
    ).withColumn("bucket", sign_bucket(F.col("b_vec"), 4))
    scored = (
        a.join(b, "bucket")
        .filter(F.col("a_label") != F.col("b_label"))
        .select(
            "a_id",
            "neg_id",
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("neg_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("a_id", "neg_id", "cos")
    )


HARD_NEGATIVE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         {_BUCKET_SQL.format(v="(embedding::DOUBLE[])")} AS bucket
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS a_id, b.vec_id AS neg_id,
         ROUND({_COS_SQL.format(a="a.v", b="b.v")}, 6) AS cos
  FROM e a JOIN e b USING (bucket)
  WHERE a.label <> b.label
)
SELECT a_id, neg_id, cos FROM scored
QUALIFY ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, neg_id ASC) = 1
"""


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(anchor, positive, negative) training triplets for contrastive /
    InfoNCE embedding training: per anchor, the highest-cosine SAME-label
    neighbor (hardest positive) and the highest-cosine DIFFERENT-label
    vector (hardest negative) inside the anchor's sign-LSH bucket; anchors
    missing either candidate drop out. The mining step a retrieval-model
    data pipeline runs after dedup — hard pairs dominate gradient quality
    (public literature: InfoNCE / SimCLR / DPR mining).

    Shape: ONE bucket equi-join bounds candidates to the anchor's cell
    (O(N²/2^bits) spread across co-partitioned cells, the
    ``hard_negative_mining`` discipline), then BOTH argmaxes fold in ONE
    grouped aggregate — min over struct(-cos, id), no window, ties by id.
    Margins are differences of identical 6-digit doubles, so they
    hash-match across engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        as_double("embedding").alias("a_vec"),
    ).withColumn("bucket", sign_bucket(F.col("a_vec"), 4))
    b = emb.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("b_label"),
        as_double("embedding").alias("b_vec"),
    ).withColumn("bucket", sign_bucket(F.col("b_vec"), 4))
    scored = (
        a.join(b, "bucket")
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (F.col("a_label") == F.col("b_label")).alias("same"),
            F.round(cosine(F.col("a_vec"), F.col("b_vec")), 6).alias("cos"),
        )
    )
    cand = F.struct((-F.col("cos")).alias("neg_cos"), F.col("b_id").alias("id"))
    folded = scored.groupBy("a_id").agg(
        F.min(F.when(F.col("same"), cand)).alias("_p"),
        F.min(F.when(~F.col("same"), cand)).alias("_n"),
    )
    return (
        folded.filter(F.col("_p").isNotNull() & F.col("_n").isNotNull())
        .select(
            "a_id",
            F.col("_p.id").alias("pos_id"),
            (-F.col("_p.neg_cos")).alias("pos_cos"),
            F.col("_n.id").alias("neg_id"),
            (-F.col("_n.neg_cos")).alias("neg_cos"),
            F.round(-F.col("_p.neg_cos") + F.col("_n.neg_cos"), 6).alias("margin"),
        )
    )


CONTRASTIVE_SQL = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         {_BUCKET_SQL.format(v="(embedding::DOUBLE[])")} AS bucket
  FROM embeddings
), scored AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         a.label = b.label AS same,
         ROUND({_COS_SQL.format(a="a.v", b="b.v")}, 6) AS cos
  FROM e a JOIN e b USING (bucket)
  WHERE a.vec_id <> b.vec_id
), pos AS (
  SELECT a_id, b_id AS pos_id, cos AS pos_cos FROM scored WHERE same
  QUALIFY ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id ASC) = 1
), neg AS (
  SELECT a_id, b_id AS neg_id, cos AS neg_cos FROM scored WHERE NOT same
  QUALIFY ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cos DESC, b_id ASC) = 1
)
SELECT p.a_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
       ROUND(p.pos_cos - n.neg_cos, 6) AS margin
FROM pos p JOIN neg n USING (a_id)
"""


def _shortlist_rerank_verdicts(
    emb: DataFrame, q: DataFrame, shortlist: DataFrame, recall_floor: int
) -> DataFrame:
    """Shared certification tail for the compressed-domain ANN family
    (``ann_pq_adc`` / ``ann_ivfadc`` / ``ann_pq_index``).

    ``shortlist`` is an approximately-ordered candidate list
    (q_id, vec_id, …) from a compressed search. The tail exact-reranks ONLY
    the shortlisted candidates against their raw vectors (the production
    refine step), computes the exact L2 top-10 as a certification arm
    (brute-force — sanctioned BNLJ, ≤ ``_N_QUERIES`` query rows broadcast),
    and emits per query: ``exact_top1_d2`` (anchors the distance kernel to
    the DuckDB oracle), ``recall_ok`` (reranked top-10 recovered ≥
    ``recall_floor`` of the exact top-10), and ``n_hits`` (the raw overlap —
    kept so tests can pin that the verdict is genuinely measured; catalog
    builders drop it). Same algebraic form and sequential summation order as
    the oracle's ``list_dot_product``, so ROUND(…, 6) matches."""
    c = emb.select(F.col("vec_id").alias("c_id"), as_double("embedding").alias("c_vec"))
    qv = q.select(F.col("vec_id").alias("q_id"), as_double("embedding").alias("q_vec"))

    def exact_d2():
        return F.round(
            dot(F.col("q_vec"), F.col("q_vec"))
            - 2 * dot(F.col("q_vec"), F.col("c_vec"))
            + dot(F.col("c_vec"), F.col("c_vec")),
            6,
        )

    # the rerank stage: exact distances for ONLY the shortlisted candidates
    # per query (joined back to their raw vectors), exact order within
    rerank_w = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    reranked10 = (
        shortlist.join(c, shortlist.vec_id == c.c_id)
        .join(F.broadcast(qv), "q_id")
        .withColumn("d2", exact_d2())
        .withColumn("rk", F.row_number().over(rerank_w))
        .filter(F.col("rk") <= 10)
        .select("q_id", "vec_id")
    )

    exact = (
        qv.crossJoin(c)
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("d2", exact_d2())
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("d2"), F.asc("c_id"))
    exact10 = (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("q_id", F.col("c_id").alias("vec_id"), "d2")
    )
    hits = (
        exact10.join(reranked10, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    top1 = exact10.groupBy("q_id").agg(F.min("d2").alias("exact_top1_d2"))
    return top1.join(hits, "q_id", "left").select(
        "q_id",
        "exact_top1_d2",
        (F.coalesce(F.col("n_hits"), F.lit(0)) >= recall_floor).alias("recall_ok"),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
    )


def _pq_adc_verdicts(
    spark: SparkSession, sf_dir: str, shortlist_k: int = 50
) -> DataFrame:
    """``ann_pq_adc`` with the shortlist size exposed, n_hits retained —
    tests truncate the shortlist to prove the verdict is measured, not
    hardcoded (a trivially-TRUE recall_ok would pass the oracle unnoticed
    since the SQL side asserts the verdict literally)."""
    from schwab_elt_etl_pipeline_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    shortlist = pq_adc_topk(emb, q, k=shortlist_k, m=16, k_codes=16)
    return _shortlist_rerank_verdicts(emb, q, shortlist, recall_floor=4)


def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011), certified at verdict
    level like ``ann_ivf_kmeans``: ADC over m=16 per-subspace codebooks
    shortlists 50 candidates per query from the compressed code table (the
    raw corpus is untouched at scan time — 16 ints per 64-dim vector), and
    the shortlist is exactly re-ranked against just those candidates' raw
    vectors. Emitted certificate per query: the exact top-1 L2 distance
    (anchors the distance kernel to the oracle) and ``recall_ok`` — the
    RERANKED top-10 recovered ≥ 4 of the exact L2 top-10 (measured 7–9 at
    sf0.001–0.01; threshold leaves ~2× margin).
    Deterministic: seeded per-subspace k-means + fixed tiebreaks."""
    return _pq_adc_verdicts(spark, sf_dir).select(
        "q_id", "exact_top1_d2", "recall_ok"
    )


_L2_SQL = (
    "list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b})"
)

ANN_PQ_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS c_vec FROM embeddings
), scored AS (
  SELECT q_id, vec_id,
         ROUND({_L2_SQL.format(a="q_vec", b="c_vec")}, 6) AS d2
  FROM c, q WHERE vec_id <> q_id
)
SELECT q_id, MIN(d2) AS exact_top1_d2, TRUE AS recall_ok
FROM scored GROUP BY q_id
"""


def _ivfadc_verdicts(
    spark: SparkSession, sf_dir: str, shortlist_k: int = 50
) -> DataFrame:
    """``ann_ivfadc`` with shortlist size exposed and n_hits retained (see
    ``_pq_adc_verdicts`` for why tests need the truncation knob)."""
    from schwab_elt_etl_pipeline_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    shortlist = ivfpq_topk(
        emb, q, k=shortlist_k, n_centroids=8, n_probe=4, m=8, k_codes=16
    )
    return _shortlist_rerank_verdicts(emb, q, shortlist, recall_floor=3)


def ann_ivfadc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC ANN (the full Jégou et al. 2011 layout: coarse IVF cells +
    residual PQ codes), certified at verdict level like ``ann_pq_adc``: the
    4-of-8-cell probe scans only the probed cells' code table (n_probe/
    n_centroids of a table already ~8× smaller than the raw vectors),
    ADC-shortlists 50 candidates per query, and the shortlist is exactly
    re-ranked. Certificate per query: the exact top-1 L2 distance (anchors
    the kernel to the oracle) plus ``recall_ok`` — reranked top-10 recovered
    ≥ 3 of the exact L2 top-10 (measured 5–10 at sf0.001–0.01, same floor
    the pytest recall gate pins; uniform-random embeddings make 4/8 cells
    the binding constraint). Deterministic: seeded coarse + per-subspace
    k-means, fixed tiebreaks."""
    return _ivfadc_verdicts(spark, sf_dir).select(
        "q_id", "exact_top1_d2", "recall_ok"
    )


ANN_IVFADC_SQL = ANN_PQ_SQL  # same certificate: exact top-1 anchor + verdict


def _index_root(name: str) -> str:
    """Deterministic-but-scoped warehouse root for persisted ANN indexes.

    Deterministic per (user, name) so repeated driver samples / bench runs
    reuse + vacuum ONE location instead of leaking per-run temp dirs; scoped
    by ``getpass.getuser()`` so multi-user hosts do not fight over ownership
    of a shared /tmp path. ``SPARK_GRAFT_WAREHOUSE`` overrides the base dir
    for deployments that want full isolation (e.g. parallel CI shards each
    pointing at their own scratch root).
    """
    import getpass
    import tempfile

    base = os.environ.get("SPARK_GRAFT_WAREHOUSE") or tempfile.gettempdir()
    try:
        user = getpass.getuser()
    except (KeyError, OSError):  # no passwd entry (containers)
        user = f"uid{os.getuid()}" if hasattr(os, "getuid") else "anon"
    return os.path.join(base, f"schwab_spark_{user}", name)


def ann_pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-PQ-index serving path, certified end-to-end: BUILD the
    index (per-subspace codebooks + m-ints-per-vector code table) into
    versioned warehouse tables, run the corpus-free ADC query
    (``pq_query_index`` reads codes + kilobyte codebooks, never raw
    vectors), exact-rerank the 50-candidate shortlist, and emit the same
    exact-top-1-anchor + recall verdict as ``ann_pq_adc`` (identical build
    params m=16/k=16/seed 42, so the measured 7–9 of 10 recall and the ≥ 4
    floor carry over; the inline-vs-index equality is separately
    test-pinned). The build lands at a DETERMINISTIC warehouse path and
    reuses ``overwrite_versioned`` — each invocation commits a fresh
    ``_v{n}`` and ``vacuum(keep_last=2)`` reclaims older ones, so repeated
    driver samples / bench runs do not accumulate index copies on disk
    (keep_last=2, not 1, so a still-lazy plan from the PREVIOUS invocation —
    whose scan pinned the prior version dir — survives the next build).
    Build-once/query-many deployment is exercised by tests; here the point
    is driver-certifying the index query path itself. Deterministic: seeded
    k-means + versioned overwrite."""
    from schwab_elt_etl_pipeline_spark.operators.similarity import (
        build_pq_index,
        pq_query_index,
    )
    from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    root = _index_root("ann_pq_index")
    books_t = ParquetTable(spark, f"{root}/books")
    codes_t = ParquetTable(spark, f"{root}/codes", cluster_by=("vec_id",))
    build_pq_index(emb, books_t, codes_t, m=16, k_codes=16)
    books_t.vacuum(keep_last=2)
    codes_t.vacuum(keep_last=2)
    shortlist = pq_query_index(books_t, codes_t, q, k=50)
    return _shortlist_rerank_verdicts(emb, q, shortlist, recall_floor=4).select(
        "q_id", "exact_top1_d2", "recall_ok"
    )


ANN_PQ_INDEX_SQL = ANN_PQ_SQL  # same certificate: exact top-1 anchor + verdict


def ann_ivfadc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-IVFADC-index serving path, certified end-to-end —
    ``ann_pq_index``'s sibling for the cell-structured layout: BUILD the
    index (coarse centroids + residual codebooks + cell-tagged code table)
    into versioned warehouse tables at a deterministic path with
    ``vacuum(keep_last=2)`` disk bounding, run the corpus-free probed-cell
    ADC query (``ivfadc_query_index`` touches only the 4 probed cells' code
    rows + kilobyte centroid/codebook tables), exact-rerank the
    50-candidate shortlist, and emit the same exact-top-1-anchor + recall
    verdict as ``ann_ivfadc`` (identical params n_centroids=8/n_probe=4/
    m=8/k=16/seeds, so the measured recall and the ≥ 3 floor carry over).
    Deterministic: seeded two-level k-means + versioned overwrite."""
    from schwab_elt_etl_pipeline_spark.operators.similarity import (
        build_ivfadc_index,
        ivfadc_query_index,
    )
    from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _N_QUERIES)
    root = _index_root("ann_ivfadc_index")
    cents_t = ParquetTable(spark, f"{root}/cents")
    books_t = ParquetTable(spark, f"{root}/books")
    codes_t = ParquetTable(spark, f"{root}/codes", cluster_by=("cell",))
    build_ivfadc_index(emb, cents_t, books_t, codes_t, n_centroids=8, m=8, k_codes=16)
    for t in (cents_t, books_t, codes_t):
        t.vacuum(keep_last=2)
    shortlist = ivfadc_query_index(cents_t, books_t, codes_t, q, k=50, n_probe=4)
    return _shortlist_rerank_verdicts(emb, q, shortlist, recall_floor=3).select(
        "q_id", "exact_top1_d2", "recall_ok"
    )


ANN_IVFADC_INDEX_SQL = ANN_PQ_SQL  # same certificate: exact top-1 anchor + verdict


def retrieval_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-5 per query (lambda = 0.7,
    pool = 20) — greedy relevance-vs-redundancy selection, the diversity
    companion of ``retrieval_rrf_hybrid``. The whole greedy loop runs as
    one per-query higher-order expression over the packed candidate pool
    (``operators/similarity.py mmr_rerank_topk``); the oracle UNROLLS the
    five selection steps as chained CTEs, each taking the argmax of the
    rounded MMR score over the not-yet-selected pool — the
    ``bpe_train_merges`` oracle discipline applied to retrieval."""
    emb = load_table(spark, sf_dir, "embeddings")
    from schwab_elt_etl_pipeline_spark.operators.similarity import mmr_rerank_topk

    return mmr_rerank_topk(
        emb, emb.filter(F.col("vec_id") < _N_QUERIES), pool=20, k=5, lam=0.7
    )


def _mmr_step_sql(i: int) -> str:
    """Selection step i >= 2: MMR argmax over the not-yet-selected pool."""
    return f""",
sel{i} AS MATERIALIZED (
  SELECT q_id, vec_id, rel, score, {i} AS rank FROM (
    SELECT r.q_id, r.vec_id, r.rel,
           ROUND(0.7 * r.rel - 0.3 * (
             SELECT MAX(s.sim) FROM msims s
             JOIN selu{i - 1} u ON u.q_id = s.q_id AND u.vec_id = s.v2
             WHERE s.q_id = r.q_id AND s.v1 = r.vec_id), 7) AS score
    FROM mpool r
    WHERE NOT EXISTS (
      SELECT 1 FROM selu{i - 1} u
      WHERE u.q_id = r.q_id AND u.vec_id = r.vec_id)
  ) QUALIFY ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY score DESC, rel DESC, vec_id ASC) = 1
), selu{i} AS (SELECT * FROM selu{i - 1} UNION ALL SELECT * FROM sel{i})"""


MMR_SQL = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id < {_N_QUERIES}
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS c_vec FROM embeddings
), mpool AS MATERIALIZED (
  SELECT q_id, vec_id, c_vec,
         ROUND({_COS_SQL.format(a="q_vec", b="c_vec")}, 6) AS rel
  FROM c, q WHERE vec_id <> q_id
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY ROUND({_COS_SQL.format(a="q_vec", b="c_vec")}, 6)
    DESC, vec_id ASC) <= 20
), msims AS MATERIALIZED (
  SELECT a.q_id, a.vec_id AS v1, b.vec_id AS v2,
         ROUND({_COS_SQL.format(a="a.c_vec", b="b.c_vec")}, 6) AS sim
  FROM mpool a JOIN mpool b
    ON a.q_id = b.q_id AND a.vec_id <> b.vec_id
), sel1 AS MATERIALIZED (
  SELECT q_id, vec_id, rel, ROUND(0.7 * rel, 7) AS score, 1 AS rank
  FROM mpool
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY ROUND(0.7 * rel, 7) DESC, rel DESC, vec_id ASC) = 1
), selu1 AS (SELECT * FROM sel1){"".join(_mmr_step_sql(i) for i in range(2, 6))}
SELECT q_id, rank, vec_id, score FROM selu5
"""


SPECS = [
    QuerySpec("retrieval_mmr_diverse", retrieval_mmr_diverse, MMR_SQL,
              doc="MMR diverse re-ranking: greedy relevance-vs-redundancy "
                  "top-5, k unrolled argmax CTE oracle"),
    QuerySpec("ann_cosine_topk", ann_cosine_topk, ANN_TOPK_SQL, headline=True,
              doc="brute-force cosine top-k (exact baseline)"),
    QuerySpec("ann_bucketed_topk", ann_bucketed_topk, ANN_BUCKETED_SQL,
              doc="sign-LSH bucketed ANN (scale path)"),
    QuerySpec("ann_ivf_kmeans", ann_ivf_kmeans, ANN_IVF_SQL,
              doc="k-means IVF ANN certified: exact top-1 anchor + recall verdict"),
    QuerySpec("ann_pq_adc", ann_pq_adc, ANN_PQ_SQL,
              doc="product-quantization ANN: ADC shortlist over codes + exact rerank, verdict-certified"),
    QuerySpec("ann_ivfadc", ann_ivfadc, ANN_IVFADC_SQL,
              doc="IVFADC ANN: coarse-cell probe + residual-PQ ADC shortlist + exact rerank, verdict-certified"),
    QuerySpec("ann_pq_index", ann_pq_index, ANN_PQ_INDEX_SQL,
              doc="persisted PQ index: build warehouse tables, corpus-free ADC query, verdict-certified"),
    QuerySpec("ann_ivfadc_index", ann_ivfadc_index, ANN_IVFADC_INDEX_SQL,
              doc="persisted IVFADC index: build warehouse tables, probed-cell ADC query, verdict-certified"),
    QuerySpec("embedding_near_dup", embedding_near_dup, EMBEDDING_NEAR_DUP_SQL,
              doc="banded embedding-cosine near-dup pairs"),
    QuerySpec("ann_projected_rerank", ann_projected_rerank, ANN_PROJECTED_SQL,
              doc="filter-then-refine ANN: 8-d sign-projection coarse pass + exact re-rank"),
    QuerySpec("hard_negative_mining", hard_negative_mining, HARD_NEGATIVE_SQL,
              doc="contrastive hard-negative mining within sign-LSH buckets"),
    QuerySpec("contrastive_triplets", contrastive_triplets, CONTRASTIVE_SQL,
              doc="(anchor, hardest positive, hardest negative) training "
                  "triplets in one bucket join + one grouped double-argmax"),
]
