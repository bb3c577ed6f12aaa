"""Stream ≡ batch parity for the incrementally maintained line-frequency
(boilerplate) index: the maintained df ledger equals the batch
distinct-doc counts, the served boilerplate set equals the batch
operator's, scrubbing against the drained index is bit-identical to
``boilerplate_scrub``, replays insert nothing, and consolidation is
exact."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.curation import boilerplate_scrub
from schwab_elt_etl_pipeline_spark.operators.dedup import split_passages
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.boilerplate_stream import (
    consolidate_line_df,
    current_boilerplate,
    current_line_df,
    scrub_docs,
    update_line_df,
)


@pytest.fixture()
def wh():
    d = tempfile.mkdtemp(prefix="boiler_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_FOOTER = "subscribe now"
_BATCHES = [
    [
        (1, f"alpha beta {_FOOTER} gamma delta"),
        (2, f"epsilon zeta {_FOOTER} eta theta"),
    ],
    [
        (3, f"iota kappa {_FOOTER}"),
        (4, "lambda mu nu xi"),
    ],
    [
        (5, f"omicron pi {_FOOTER} rho sigma"),
        (6, _FOOTER),
    ],
]


def _drain(spark, wh):
    lines = ParquetTable(spark, f"{wh}/lines")
    docstats = ParquetTable(spark, f"{wh}/docstats")
    for epoch, rows in enumerate(_BATCHES):
        b = spark.createDataFrame(rows, "doc_id long, text string")
        update_line_df(b, lines, docstats, epoch=epoch)
    union = spark.createDataFrame(
        [r for rows in _BATCHES for r in rows], "doc_id long, text string"
    )
    return lines, docstats, union


def test_line_df_index_matches_batch_counts(spark, wh):
    lines, docstats, union = _drain(spark, wh)
    got = {r.passage: r.df for r in current_line_df(lines).collect()}
    want = {
        r.passage: r.df
        for r in split_passages(union, "doc_id", "text", 2)
        .groupBy("passage")
        .agg(F.count_distinct("_id").cast("long").alias("df"))
        .collect()
    }
    assert got == want
    assert got[_FOOTER] == 5  # the planted boilerplate line

    # served boilerplate set == the batch operator's threshold rule
    served = {
        r.passage
        for r in current_boilerplate(lines, docstats, 2, 25).collect()
    }
    assert served == {p for p, df in want.items() if df >= 2}
    assert _FOOTER in served


def test_scrub_against_drained_index_equals_batch_operator(spark, wh):
    lines, docstats, union = _drain(spark, wh)
    boiler = current_boilerplate(lines, docstats, 2, 25)
    streamed = sorted(map(tuple, scrub_docs(union, boiler).collect()))
    batch = sorted(
        map(
            tuple,
            boilerplate_scrub(
                union, passage_tokens=2, min_docs=2, min_docs_per=25
            ).collect(),
        )
    )
    assert streamed == batch
    # the planted footer is gone from every rebuilt text
    assert all(_FOOTER not in t[1] for t in streamed)


def test_replay_inserts_nothing_and_consolidation_exact(spark, wh):
    lines, docstats, _ = _drain(spark, wh)
    n_lines, n_stats = lines.read().count(), docstats.read().count()
    b1 = spark.createDataFrame(_BATCHES[1], "doc_id long, text string")
    update_line_df(b1, lines, docstats, epoch=1)  # replay epoch 1
    assert lines.read().count() == n_lines
    assert docstats.read().count() == n_stats

    before_df = sorted(map(tuple, current_line_df(lines).collect()))
    before_boiler = sorted(
        r.passage for r in current_boilerplate(lines, docstats).collect()
    )
    consolidate_line_df(lines, docstats)
    assert sorted(map(tuple, current_line_df(lines).collect())) == before_df
    assert (
        sorted(r.passage for r in current_boilerplate(lines, docstats).collect())
        == before_boiler
    )
    # folded to one NULL-epoch row per line / one doc total
    assert lines.read().filter(F.col("_epoch").isNotNull()).count() == 0
    assert docstats.read().count() == 1
