"""Incrementally maintained bigram-LM model — the streaming twin of the
``bigram_lm_perplexity_gate`` / ``perplexity_bucket_split`` training pass.

A production LM quality filter retrains its n-gram counts as crawl shards
arrive rather than rescanning the corpus. The state is the two trained
count tables, maintained as epoch-delta ledgers (the ``seasonal_stream`` /
ACF-moments protocol — integer count deltas keyed on (ngram…, _epoch), so
a replayed micro-batch inserts nothing and the epoch-sum equals the batch
aggregation exactly):

- ``bigram``: (prev, cur, bc, _epoch) — held-in slice bigram counts;
- ``unigram``: (token, uc, _epoch) — held-in slice unigram counts.

Scoring goes through the SHARED kernel (``operators/langmodel.py``): after
any prefix of the stream, ``lm_score_docs`` against ``current_lm_model``
is bit-identical to the batch query retrained on the same documents —
pinned by tests/test_streaming_lm.py. The vocabulary tables are
Zipf-bounded, so the maintained model stays broadcast-sized at any corpus
scale; ``consolidate_lm_counts`` folds committed epochs on the usual
post-checkpoint cadence.

Reference behavior mirrored: the periodically retrained scoring models of
sql/opt.sql's staged quality procedures, re-expressed as exactly-once
incremental count maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.query import StreamingQuery

from schwab_elt_etl_pipeline_spark.operators.langmodel import (
    doc_bigrams,
    doc_unigrams,
    held_in,
)
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.runner import start_foreach_batch

__all__ = [
    "held_in",
    "update_lm_counts",
    "current_lm_model",
    "consolidate_lm_counts",
    "lm_stream",
]


def update_lm_counts(
    batch: DataFrame,
    bigram: ParquetTable,
    unigram: ParquetTable,
    epoch: int | None = None,
) -> None:
    """Merge one micro-batch's held-in n-gram count deltas into the model
    ledgers (epoch-keyed ``insert_new`` — replays insert nothing)."""
    held = batch.filter(held_in()).localCheckpoint(eager=True)  # feeds both
    bg = (
        doc_bigrams(held)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("bc"))
        .withColumn("_epoch", F.lit(epoch).cast("long"))
    )
    bigram.insert_new(bg, keys=["prev", "cur", "_epoch"])
    ug = (
        doc_unigrams(held)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("uc"))
        .withColumn("_epoch", F.lit(epoch).cast("long"))
    )
    unigram.insert_new(ug, keys=["token", "_epoch"])


def current_lm_model(
    bigram: ParquetTable, unigram: ParquetTable
) -> tuple[DataFrame, DataFrame]:
    """The live (prev, cur, bc) and (token, uc) trained tables — epoch
    deltas summed out (integer addition is exact, so this equals the batch
    aggregation over every held-in document delivered so far)."""
    bg = (
        bigram.read()
        .groupBy("prev", "cur")
        .agg(F.sum("bc").cast("long").alias("bc"))
    )
    ug = unigram.read().groupBy("token").agg(F.sum("uc").cast("long").alias("uc"))
    return bg, ug


def consolidate_lm_counts(bigram: ParquetTable, unigram: ParquetTable) -> None:
    """Collapse the ledgers to one NULL-epoch row per n-gram. Counts are
    cast back to the on-disk types (schema-drift guard, as in
    ``consolidate_cells``); usual caveat — only past the checkpoint."""
    for table, keys, val in ((bigram, ["prev", "cur"], "bc"), (unigram, ["token"], "uc")):
        cur = table.read()
        vtype = {f.name: f.dataType.simpleString() for f in cur.schema.fields}[val]
        table.overwrite_versioned(
            cur.groupBy(*keys)
            .agg(F.sum(val).cast(vtype).alias(val))
            .withColumn("_epoch", F.lit(None).cast("long"))
        )


def lm_stream(
    docs: DataFrame,
    bigram: ParquetTable,
    unigram: ParquetTable,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain the bigram-LM model incrementally over a document stream."""

    def _sink(batch: DataFrame, epoch: int) -> None:
        update_lm_counts(batch, bigram, unigram, epoch=epoch)

    return start_foreach_batch(
        docs, _sink, checkpoint_dir, trigger_seconds, output_mode="append"
    )
