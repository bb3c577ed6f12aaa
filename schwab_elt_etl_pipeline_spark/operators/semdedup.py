"""SemDeDup — semantic (embedding-space) near-duplicate pruning.

SemDeDup (Abbas et al. 2023, arXiv:2303.09540) removes semantic duplicates
a lexical pass can't see: cluster the embedding space, then compare pairs
ONLY within a cluster and drop all but one member of every near-identical
group. The clustering is what makes it tractable — candidate generation is
bounded by cell populations instead of the corpus square.

Spark-first shape: the cell assignment is one broadcast-centroid E-step
(the corpus never shuffles for it — same shape as ``kmeans_lloyd_train``);
the within-cell comparison is ONE equi-join keyed on the cell id, so the
corpus shuffles exactly once and pair work is Σ|cell|² — never all-pairs.
At 100 TB the operator holds by scaling k (cells ≈ √N keeps expected cell
populations flat, the paper uses ~100k clusters at web scale); mega-cells
from skewed embedding mass are split by AQE skew-join handling on the
cell-keyed exchange.

Relationship to the r8 semantic-dedup pair (catalog/curation2.py):
``semantic_dedup_keep`` pins the keep/drop verdict semantics on an id-band
candidate generator (a demo blocking) and ``semantic_dedup_lsh`` swaps in
multi-table sign-LSH buckets. This module adds the clustering the PAPER
actually uses — k-means-style cells — which is also the variant whose
candidate quality degrades gracefully (cells follow embedding density;
axis-aligned LSH planes don't). Together the three certify the verdict
rule once and the candidate generator three ways.

Determinism stack (repo-wide ANN idiom): cosine rounded to 6 with the
centroid-id tie-break on assignment; the keep rule is keep-first-by-id —
a member is a duplicate iff a LOWER-id member of the same cell sits within
the cosine threshold, and ``dup_of`` names the smallest such id. Both
engines compute the same in-order float dot product, so the rounded values
hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.similarity import (
    as_double,
    centroid_fold,
    dot,
    l2_norm,
    nearest_centroid_struct,
)


def assign_cells(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Cell assignment against an explicit centroid table: ``vecs`` is
    (vec_id, v), ``cents`` is (cent_id, c_vec). The centroid table folds to
    ONE broadcast array row (``centroid_fold``) and the argmax is a per-row
    fold (``nearest_centroid_struct``) — a pure projection: no k× fan-out,
    no per-vector window shuffle, the corpus genuinely never moves (the
    former shape broadcast the centroids but still exchanged the scored
    corpus on vec_id for the argmax window). Shared by the batch operator
    and the incremental index twin (``streaming/corpus.py
    update_semdedup_index``) so the two cannot drift on the assignment
    rule.

    Zero-safety (r12 discipline, unchanged semantics): try_divide leaves a
    zero-norm cosine NULL, the fold's -2.0 sentinel reproduces "NULLs last
    under DESC, tie to the lowest cent_id"; the norms stay hoisted per
    side, so every rounded cosine is bit-identical to the window form. An
    empty centroid table yields no rows (the former empty-crossJoin
    contract), hence the NULL-struct filter."""
    best = nearest_centroid_struct(F.col("v"), F.col("_vn"), zero_safe=True)
    return (
        vecs.withColumn("_vn", l2_norm(F.col("v")))
        .crossJoin(F.broadcast(centroid_fold(cents)))
        .withColumn("_best", best)
        .filter(F.col("_best").isNotNull())
        .select("vec_id", "v", F.col("_best")["cid"].alias("cluster"))
    )


def seed_centroids(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The fixed-seed centroid rule: the k lowest-id vectors (deterministic
    in both engines), excluding zero-norm vectors — a directionless seed
    has no cosine, and the engines disagree on where its NULL/NaN score
    sorts (Spark's try_divide NULL orders last under DESC; DuckDB's 0/0
    NaN orders first), so it must never become a centroid.
    Output: (cent_id, c_vec)."""
    return emb.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cent_id"),
        as_double(vec_col).alias("c_vec"),
    ).where(dot(F.col("c_vec"), F.col("c_vec")) > 0)


def assign_cells_fixed(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fixed-seed cell assignment (centroids = the k lowest-id vectors,
    deterministic in both engines): (vec_id, v, cluster)."""
    vecs = emb.select(
        F.col(id_col).alias("vec_id"), as_double(vec_col).alias("v")
    )
    return assign_cells(vecs, seed_centroids(emb, k, id_col, vec_col))


def keep_first_dups(
    members: DataFrame, pool: DataFrame, tau: float, slices: int = 1
) -> DataFrame:
    """The SemDeDup verdict rule as one shared definition: for each row of
    ``members``, the smallest LOWER id in ``pool`` sharing its cell with
    rounded cosine ≥ ``tau``. Both sides carry (vec_id, v, nrm, cluster);
    output is (vec_id, dup_of) for duplicate members only. ONE cell-keyed
    equi-join — pair work is bounded by cell populations.

    ``slices`` > 1 salts the cell key (guide §2.5 hot-key salting): each
    ``members`` row lands in one of ``slices`` deterministic sub-buckets of
    its cell and ``pool`` is replicated across all of them, so a cell's
    Σ|cell|² pair work spreads over ``slices`` exchange keys instead of one.
    Results are identical (every same-cell pair still meets exactly once).
    Callers size it from k vs the cluster's parallelism (see
    ``semdedup_prune``): with few cells the byte-based AQE coalescer sees a
    tiny exchange and funnels the CPU-dense pair stage onto one task; with
    cell count >= parallelism (the real-corpus regime, k ~ sqrt(N)) the salt
    degenerates to 1 and the plan is byte-for-byte the unsalted one — the
    exchange stays ENSURE_REQUIREMENTS so AQE's skew-join splitting of
    mega-cells keeps working at scale.

    Zero-norm (all-zero) vectors are EXCLUDED from both sides of the pair
    stage: a vector with no direction has no cosine — under ANSI mode the
    0/0 division is a hard DIVIDE_BY_ZERO error that would kill the whole
    job, so the pair cosine divides with ``try_divide`` (NULL on a zero
    denominator; NULL >= tau is not true, so the pair drops). try_divide,
    NOT a CASE guard around the division: wrapping the higher-order
    ``aggregate`` dot fold in a conditional knocked the predicate out of
    codegen — measured 1.7 s -> 2.9-3.4 s on the sf0.1 pair stage; the
    try_divide form measures 1.8 s with identical verdicts. (A plain
    conjunct alone is not a guard either: Catalyst may reorder
    predicates.) Zero vectors are therefore always keepers and never
    evidence against another member; their cell assignment lands
    deterministically (NULL cosine for every centroid — ordered last
    under DESC — tie broken by lowest cent_id)."""
    a = members.select(
        "cluster",
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("a_v"),
        F.col("nrm").alias("a_n"),
    )
    b = pool.select(
        "cluster",
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("b_v"),
        F.col("nrm").alias("b_n"),
    )
    keys = ["cluster"]
    if slices > 1:
        a = a.withColumn("_sl", F.pmod(F.hash("a_id"), F.lit(slices)))
        b = b.withColumn(
            "_sl", F.explode(F.sequence(F.lit(0), F.lit(slices - 1)))
        )
        keys = ["cluster", "_sl"]
    return (
        a.join(b, keys)
        .where(F.col("b_id") < F.col("a_id"))
        .where(
            F.round(
                F.try_divide(
                    dot(F.col("a_v"), F.col("b_v")),
                    F.col("a_n") * F.col("b_n"),
                ),
                6,
            )
            >= tau
        )
        .groupBy(F.col("a_id").alias("vec_id"))
        .agg(F.min("b_id").alias("dup_of"))
    )


def semdedup_prune(
    emb: DataFrame,
    k: int = 8,
    tau: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-member SemDeDup verdicts: (vec_id, cluster, is_dup, dup_of).

    ``is_dup`` = 1 iff some lower-id member of the same cell has rounded
    cosine ≥ ``tau``; ``dup_of`` is the smallest such id (-1 for keepers —
    a typed sentinel instead of NULL keeps the hash type-stable). A
    keep-first consumer drops every ``is_dup = 1`` row and retains exactly
    one representative per near-identical group.

    ``tau`` defaults low (0.35) for the synthetic near-uniform benchmark
    embeddings, whose within-cell cosines top out ≈0.49; real corpora run
    ~0.95+ (the paper's operating range). The assignment table is
    localCheckpointed before the self-join so the E-step computes once.
    """
    # the L2 norm is a per-vector invariant: hoist it out of the pair
    # stage (sqrt(dot(v,v)) is the identical float either way, so the
    # rounded pair cosine is bit-identical to the oracle's per-pair form)
    # — per pair work drops from three 64-element folds to one
    assigned = (
        assign_cells_fixed(emb, k, id_col, vec_col)
        .withColumn("nrm", l2_norm(F.col("v")))
        .localCheckpoint(eager=False)
    )
    # salt the cell key only when there are too few cells to feed every
    # core (k << parallelism — the degenerate small-k case); at the paper's
    # operating point (k ~ sqrt(N) >= cluster parallelism) this is 1 and
    # the pair join is the plain unsalted cell join
    par = emb.sparkSession.sparkContext.defaultParallelism
    slices = max(1, -(-2 * par // max(k, 1)))
    dups = keep_first_dups(assigned, assigned, tau, slices=slices)
    return assigned.join(dups, "vec_id", "left").select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.when(F.col("dup_of").isNull(), 0).otherwise(1).alias("is_dup"),
        F.coalesce(F.col("dup_of"), F.lit(-1).cast("long")).alias("dup_of"),
    )
