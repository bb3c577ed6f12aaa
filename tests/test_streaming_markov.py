"""Stream ≡ batch parity for the incremental Markov transition matrix
(streaming/markov_stream.py vs catalog event_transition_probs), including
the cross-batch boundary pairs the streaming form must stitch."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog.analytics12 import event_transition_probs
from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.markov_stream import (
    consolidate_last_seen,
    current_cells,
    transition_probs,
    transition_stream,
    update_transition_cells,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def tmpdirs():
    dirs = [tempfile.mkdtemp(prefix=f"mkv_{n}_") for n in ("src", "ck", "wh")]
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _matrix(df):
    return {(r.prev, r.next): (r.cnt, r.prob) for r in df.collect()}


def _ev(evid, ts_s, user, etype):
    return (evid, datetime(2024, 1, 1, 0, 0, ts_s), user, etype)


_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string"


def test_boundary_pairs_stitched_across_batches(spark, tmpdirs):
    """The last event of batch 1 pairs with the first event of batch 2 for
    the same user; a brand-new user contributes no boundary pair."""
    _, _, wh = tmpdirs
    cells = ParquetTable(spark, f"{wh}/cells")
    last = ParquetTable(spark, f"{wh}/last")
    b1 = spark.createDataFrame(
        [_ev(1, 1, 7, "x"), _ev(2, 2, 7, "y")], _SCHEMA
    )
    b2 = spark.createDataFrame(
        [_ev(3, 3, 7, "z"), _ev(4, 4, 9, "x")], _SCHEMA
    )
    update_transition_cells(b1, cells, last, epoch=1)
    update_transition_cells(b2, cells, last, epoch=2)
    got = {(r.prev, r.next): r.cnt for r in current_cells(cells).collect()}
    assert got == {("x", "y"): 1, ("y", "z"): 1}

    n = cells.read().count()
    update_transition_cells(b2, cells, last, epoch=2)  # replayed delivery
    assert cells.read().count() == n
    assert {(r.prev, r.next): r.cnt for r in current_cells(cells).collect()} == got


def test_stream_drain_matches_batch(spark, tmpdirs):
    src, ck, wh = tmpdirs
    ev = load_table(spark, SF_DIR, "events")
    n = ev.count()
    mid = (
        ev.orderBy("ts", "event_id")
        .limit(n // 2)
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .first()
    )
    before = (F.col("ts") < mid.ts) | (
        (F.col("ts") == mid.ts) & (F.col("event_id") <= mid.event_id)
    )
    for part in (ev.filter(before), ev.filter(~before)):
        part.coalesce(1).write.mode("append").parquet(src)

    cells = ParquetTable(spark, f"{wh}/cells")
    last = ParquetTable(spark, f"{wh}/last")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = transition_stream(stream, cells, last, ck)
    q.awaitTermination(300)

    got = _matrix(transition_probs(current_cells(cells)))
    want = _matrix(event_transition_probs(spark, SF_DIR))
    assert got == want

    # consolidation preserves the boundary state: one more batch after the
    # collapse still stitches against each user's true last event
    consolidate_last_seen(last)
    latest = {r.user_id: r.event_type for r in last.read().collect()}
    want_last = {
        r.user_id: r.et
        for r in ev.groupBy("user_id")
        .agg(F.max_by("event_type", F.struct("ts", "event_id")).alias("et"))
        .collect()
    }
    assert latest == want_last
