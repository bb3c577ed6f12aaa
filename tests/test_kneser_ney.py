"""Kneser-Ney scorer: the Spark DECIMAL(38,0) rational must equal an
exact-Fraction Python reference floored to ppb, including the backoff
for unseen histories and the discounted-to-zero edge cases."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.langmodel import (
    doc_bigrams,
    kn_score_docs,
)


def _py_kn_ppb(bigrams, trained):
    """Exact interpolated-KN reference with d = 3/4 over Fractions."""
    cv, n1v, n1w = {}, {}, {}
    for (v, w), c in trained.items():
        cv[v] = cv.get(v, 0) + c
        n1v[v] = n1v.get(v, 0) + 1
        n1w[w] = n1w.get(w, 0) + 1
    tt = len(trained)
    out = []
    for v, w in bigrams:
        if v in cv:
            p = Fraction(max(trained.get((v, w), 0) * 4 - 3, 0), 4 * cv[v]) + (
                Fraction(3, 4)
                * Fraction(n1v[v], cv[v])
                * Fraction(n1w.get(w, 0), tt)
            )
        else:
            p = Fraction(n1w.get(w, 0), tt)
        out.append((p * 1_000_000_000).numerator // (p * 1_000_000_000).denominator)
    return out


def test_kn_score_matches_fraction_reference(spark):
    train_rows = [
        (1, "a b a b a c"),
        (2, "b c b a"),
    ]
    score_rows = [
        (10, "a b c"),      # seen histories
        (11, "a z"),        # seen history, unseen continuation
        (12, "z a"),        # UNSEEN history -> continuation backoff
        (13, "z z"),        # unseen everything -> 0
    ]
    tdf = spark.createDataFrame(train_rows, "doc_id long, text string")
    sdf = spark.createDataFrame(score_rows, "doc_id long, text string")
    trained_df = (
        doc_bigrams(tdf)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).cast("long").alias("bc"))
    )
    trained = {
        (r.prev, r.cur): r.bc for r in trained_df.collect()
    }
    got = {
        r.doc_id: (r.n_big, r.kn_avg_ppb)
        for r in kn_score_docs(doc_bigrams(sdf), trained_df).collect()
    }
    for doc_id, text in score_rows:
        toks = text.split()
        bgs = list(zip(toks, toks[1:]))
        ppbs = _py_kn_ppb(bgs, trained)
        assert got[doc_id] == (len(bgs), sum(ppbs) // len(bgs)), doc_id
    assert got[13][1] == 0  # fully out-of-model
    assert got[12][1] > 0  # backoff actually contributes


def test_kn_empty_model_scores_zero_not_error(spark):
    """tt floors at 1 (kn_stats): with an EMPTY trained table every bigram
    takes the 0-ppb continuation backoff instead of dividing by zero
    (Spark would NULL, DuckDB would raise — the silent-vs-error split)."""
    empty = spark.createDataFrame([], "prev string, cur string, bc long")
    sdf = spark.createDataFrame([(10, "a b c")], "doc_id long, text string")
    got = kn_score_docs(doc_bigrams(sdf), empty).collect()
    assert [(r.doc_id, r.n_big, r.kn_avg_ppb) for r in got] == [(10, 2, 0)]
