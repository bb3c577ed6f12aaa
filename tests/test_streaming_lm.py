"""Stream ≡ batch parity for the incrementally maintained bigram-LM model
(streaming/lm_stream.py vs the catalog training pass, through the shared
operators/langmodel.py kernel)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.langmodel import (
    doc_bigrams,
    doc_unigrams,
    lm_score_docs,
)
from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.lm_stream import (
    consolidate_lm_counts,
    held_in,
    current_lm_model,
    lm_stream,
    update_lm_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def dirs():
    made = [tempfile.mkdtemp(prefix=p) for p in ("lm_src_", "lm_ck_", "lm_wh_")]
    yield made
    for d in made:
        shutil.rmtree(d, ignore_errors=True)


def _batch_model(docs):
    held = docs.filter(held_in())
    bg = doc_bigrams(held).groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("long").alias("bc")
    )
    ug = doc_unigrams(held).groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("uc")
    )
    return bg, ug


def _scores(docs, model):
    return {
        r.doc_id: (r.n_big, r.score_ppm)
        for r in lm_score_docs(doc_bigrams(docs), *model).collect()
    }


def test_lm_stream_drain_matches_batch_training(spark, dirs):
    """After draining the corpus in file-per-trigger micro-batches, the
    maintained count tables equal the batch aggregation and scoring the
    corpus through the shared kernel is bit-identical to the batch query's
    training pass; consolidation preserves both."""
    src, ck, wh = dirs
    docs = load_table(spark, SF_DIR, "documents")
    for part in (docs.filter(F.col("doc_id") % 2 == 0), docs.filter(F.col("doc_id") % 2 == 1)):
        part.coalesce(1).write.mode("append").parquet(src)

    bigram = ParquetTable(spark, f"{wh}/bigram")
    unigram = ParquetTable(spark, f"{wh}/unigram")
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = lm_stream(stream, bigram, unigram, ck)
    q.awaitTermination(300)

    got_bg, got_ug = current_lm_model(bigram, unigram)
    want_bg, want_ug = _batch_model(docs)
    assert {(r.prev, r.cur): r.bc for r in got_bg.collect()} == {
        (r.prev, r.cur): r.bc for r in want_bg.collect()
    }
    assert {r.token: r.uc for r in got_ug.collect()} == {
        r.token: r.uc for r in want_ug.collect()
    }

    want_scores = _scores(docs, (want_bg, want_ug))
    assert _scores(docs, (got_bg, got_ug)) == want_scores

    consolidate_lm_counts(bigram, unigram)
    assert bigram.read().filter(F.col("_epoch").isNotNull()).count() == 0
    assert _scores(docs, current_lm_model(bigram, unigram)) == want_scores


def test_lm_counts_epoch_replay_idempotent(spark, dirs):
    _, _, wh = dirs
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    bigram = ParquetTable(spark, f"{wh}/bg2")
    unigram = ParquetTable(spark, f"{wh}/ug2")
    update_lm_counts(docs, bigram, unigram, epoch=0)
    n_b, n_u = bigram.read().count(), unigram.read().count()
    snap = _scores(docs, current_lm_model(bigram, unigram))
    update_lm_counts(docs, bigram, unigram, epoch=0)  # replayed delivery
    assert (bigram.read().count(), unigram.read().count()) == (n_b, n_u)
    assert _scores(docs, current_lm_model(bigram, unigram)) == snap


def test_kn_scoring_from_maintained_model_matches_batch(spark, dirs):
    """Kneser-Ney scoring through the SHARED kernel against the drained
    incremental model equals batch training — KN derives everything from
    the (prev, cur, bc) table, so model parity lifts to KN parity."""
    from schwab_elt_etl_pipeline_spark.operators.langmodel import kn_score_docs

    _, _, wh = dirs
    docs = load_table(spark, SF_DIR, "documents")
    files = [r.doc_id % 4 for r in docs.select("doc_id").collect()]
    assert len(set(files)) > 1  # genuinely multi-batch

    bigram = ParquetTable(spark, f"{wh}/kn_bigram")
    unigram = ParquetTable(spark, f"{wh}/kn_unigram")
    for part in sorted(set(files)):
        update_lm_counts(
            docs.filter(F.col("doc_id") % 4 == part), bigram, unigram, epoch=part
        )
    maintained_bg, _ = current_lm_model(bigram, unigram)
    batch_bg, _ = _batch_model(docs)

    big = doc_bigrams(docs)
    got = {
        r.doc_id: (r.n_big, r.kn_avg_ppb)
        for r in kn_score_docs(big, maintained_bg).collect()
    }
    want = {
        r.doc_id: (r.n_big, r.kn_avg_ppb)
        for r in kn_score_docs(big, batch_bg).collect()
    }
    assert got == want
