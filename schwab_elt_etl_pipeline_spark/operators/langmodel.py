"""Shared interpolated bigram-LM core — ONE definition of extraction,
model statistics, and scoring, used by the batch catalog queries
(``catalog/analytics6.py bigram_lm_perplexity_gate`` /
``perplexity_bucket_split``) and the incremental maintainer
(``streaming/lm_stream.py``), so the two paths cannot drift (the same
shared-kernel discipline as ``split_passages`` / ``doc_tokens_and_windows``).

The score for a document with ``n_big`` scored positions (tokens with a
predecessor), bigram-hit mass ``sum_bc``, unigram mass ``sum_uc``, against
a model with bigram total ``bt``, unigram total ``ut``, vocabulary ``v``:

    score_ppm = sum_bc / n_big / bt * 750000
              + (sum_uc + n_big) / n_big / (ut + v) * 250000

i.e. a 0.75/0.25 interpolation of trained bigram relative frequency with
an add-1-smoothed unigram term — the log-free rational stand-in for
KenLM-style perplexity documented on ``unigram_rarity`` (every
accumulation is an integer sum; the float expression is fixed-order, so
Spark and DuckDB agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str) -> F.Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def held_in() -> F.Column:
    """The deterministic 80% training slice shared by the batch LM queries
    and the streaming model maintainer — ONE definition so the
    stream-equals-batch parity can never drift on the slice predicate.
    (A function, not a module constant: building a Column requires an
    active Spark context, which imports must not assume.)"""
    return F.col("doc_id") % 5 > 0


def doc_bigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, prev, cur) bigram stream via a per-row array zip — no window,
    no shuffle (docs with <2 tokens contribute nothing)."""
    d = docs.select(F.col(id_col).alias("_id"), _toks(text_col).alias("t"))
    sz = F.size("t")
    return (
        d.filter(sz >= 2)
        .select(
            "_id",
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, sz - 1).alias("prev"),
                    F.slice("t", 2, sz - 1).alias("cur"),
                )
            ).alias("bg"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("bg.prev").alias("prev"),
            F.col("bg.cur").alias("cur"),
        )
    )


def doc_unigrams(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) whitespace unigram stream."""
    return docs.select(
        F.col(id_col).alias(id_col), F.explode(_toks(text_col)).alias("token")
    )


def lm_stats(bigram: DataFrame, unigram: DataFrame) -> DataFrame:
    """The 1-row (bt, ut, v) scalar from trained (prev, cur, bc) and
    (token, uc) count tables."""
    return bigram.agg(F.sum("bc").cast("long").alias("bt")).crossJoin(
        unigram.agg(
            F.sum("uc").cast("long").alias("ut"),
            F.count(F.lit(1)).alias("v"),
        )
    )


def lm_score_docs(
    big: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_big, score_ppm) for every document in ``big`` (a
    ``doc_bigrams`` stream) against a trained model. The model tables are
    Zipf-bounded vocabulary aggregations joined back via broadcast; at
    sizes past broadcast the same equi-joins degrade to shuffled hash
    joins on the token key."""
    stats = lm_stats(bigram, unigram)
    per_doc = (
        big.join(F.broadcast(bigram), ["prev", "cur"], "left")
        .join(
            F.broadcast(unigram.withColumnRenamed("token", "cur")), ["cur"], "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_big"),
            F.sum(F.coalesce(F.col("bc"), F.lit(0))).alias("sum_bc"),
            F.sum(F.coalesce(F.col("uc"), F.lit(0))).alias("sum_uc"),
        )
    )
    return per_doc.crossJoin(F.broadcast(stats)).select(  # 1-row corpus totals
        id_col,
        "n_big",
        (
            F.col("sum_bc").cast("double")
            / F.col("n_big").cast("double")
            / F.col("bt").cast("double")
            * F.lit(750000.0)
            + (F.col("sum_uc") + F.col("n_big")).cast("double")
            / F.col("n_big").cast("double")
            / (F.col("ut") + F.col("v")).cast("double")
            * F.lit(250000.0)
        ).alias("score_ppm"),
    )


def kn_stats(bigram: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Kneser-Ney statistics derived from a trained (prev, cur, bc) table:
    per-prev (cv = c(v), n1v = N1+(v,.)), per-cur (n1w = N1+(., w)), and
    the 1-row distinct-bigram-type total ``tt`` = N1+(..). All Zipf-bounded
    vocabulary aggregations — nothing here scales with corpus token count.
    """
    per_prev = bigram.groupBy("prev").agg(
        F.sum("bc").cast("long").alias("cv"),
        F.count(F.lit(1)).cast("long").alias("n1v"),
    )
    per_cur = bigram.groupBy("cur").agg(
        F.count(F.lit(1)).cast("long").alias("n1w")
    )
    # greatest(count, 1): an EMPTY trained table would make tt a zero
    # divisor — Spark's decimal div nulls out while DuckDB's // raises, a
    # silent-vs-error divergence. With the floor, the degenerate model
    # scores every bigram at the 0-ppb backoff on both engines.
    tt = bigram.agg(
        F.greatest(F.count(F.lit(1)), F.lit(1)).cast("long").alias("tt")
    )
    return per_prev, per_cur, tt


# Interpolated Kneser-Ney with discount d = 3/4 (Chen & Goodman 1999,
# public literature), as ONE exact rational per bigram:
#
#   P(w|v) = max(c(vw) - 3/4, 0)/c(v) + (3/4)(N1+(v,.)/c(v))(N1+(.,w)/T)
#          = [max(4 c(vw) - 3, 0) T + 3 N1+(v,.) N1+(.,w)] / (4 c(v) T)
#
# numerator/denominator in DECIMAL(38,0) (HUGEINT on the oracle side — the
# DSIR/DoReMi cross-multiplication discipline; 4 c T 1e9 stays under 1e38
# far past 100 TB), floored to parts-per-billion with integral div so both
# engines agree bit-for-bit. Unseen history backs off to pure continuation
# probability N1+(.,w)/T — the KN base case.
_KN_PPB = """
    CASE WHEN cv IS NOT NULL THEN cast(
      ((cast(greatest(4 * coalesce(bc, 0L) - 3, 0L) as decimal(38,0)) * tt
        + 3 * cast(n1v as decimal(38,0)) * coalesce(n1w, 0L)) * 1000000000)
      div (4 * cast(cv as decimal(38,0)) * tt) as long)
    ELSE cast(
      (cast(coalesce(n1w, 0L) as decimal(38,0)) * 1000000000) div tt as long)
    END"""


def kn_score_docs(
    big: DataFrame, bigram: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_big, kn_avg_ppb) for every document in ``big`` (a
    ``doc_bigrams`` stream) against a trained bigram table, under
    interpolated Kneser-Ney smoothing with d = 3/4 — the exact-rational
    member of the LM quality family (the 0.75/0.25 interpolation in
    ``lm_score_docs`` is the float fixed-order form; this one is
    all-integer end to end, so it composes with the hashed-output
    discipline anywhere a float would be a liability). Model-side joins
    broadcast (Zipf-bounded); the per-bigram probability is one
    DECIMAL(38,0) expression, the per-doc score an integer mean."""
    per_prev, per_cur, tt = kn_stats(bigram)
    scored = (
        big.join(F.broadcast(bigram), ["prev", "cur"], "left")
        .join(F.broadcast(per_prev), "prev", "left")
        .join(F.broadcast(per_cur), "cur", "left")
        .crossJoin(F.broadcast(tt))
        .select(F.col(id_col), F.expr(_KN_PPB).alias("ppb"))
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_big"),
        F.expr("cast(sum(ppb) div count(1) as long)").alias("kn_avg_ppb"),
    )
