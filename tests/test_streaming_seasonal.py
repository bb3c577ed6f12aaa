"""Stream ≡ batch parity for the incremental seasonal baseline
(streaming/seasonal_stream.py vs catalog t_seasonal_residuals).

The counts table is a lossless sufficient statistic, so parity is EXACT:
after draining the events corpus in micro-batches, the maintained baseline
equals the batch query's baseline and re-flagging the corpus reproduces
t_seasonal_residuals row-for-row. Mid-stream, each batch's flags must match
a from-scratch computation over the prefix seen so far (the as-of-that-batch
baseline contract), and replaying an epoch must change nothing.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog.analytics10 import t_seasonal_residuals
from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.seasonal_stream import (
    current_counts,
    consolidate_counts,
    flag_seasonal,
    seasonal_baseline,
    seasonal_counts,
    seasonal_stream,
    update_seasonal_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def tmpdirs():
    dirs = [tempfile.mkdtemp(prefix=f"seas_{n}_") for n in ("src", "ck", "wh")]
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return {
        r.event_id: (r.event_type, r.hod, r.value, r.baseline, r.resid, r.is_anom)
        for r in df.collect()
    }


def test_baseline_from_counts_matches_batch_percentiles(spark):
    """seasonal_baseline over the counts statistic == the batch query's two
    percentile aggregations, and flagging with it reproduces the catalog
    query row-for-row."""
    ev = load_table(spark, SF_DIR, "events")
    base = seasonal_baseline(seasonal_counts(ev))
    got = _rows(flag_seasonal(ev, base))
    want = _rows(t_seasonal_residuals(spark, SF_DIR))
    assert got == want


def test_stream_drain_matches_batch(spark, tmpdirs):
    src, ck, wh = tmpdirs
    ev = load_table(spark, SF_DIR, "events")
    # two time-ordered micro-batches (file-per-trigger replay); the cut is
    # the middle row in (ts, event_id) order — timestamp_ntz compares fine,
    # it just doesn't cast to double
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
    prefix = ev.filter(before)
    for part in (prefix, ev.filter(~before)):
        part.coalesce(1).write.mode("append").parquet(src)

    counts = ParquetTable(spark, f"{wh}/counts")
    flagged = ParquetTable(spark, f"{wh}/flagged")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = seasonal_stream(stream, counts, flagged, ck)
    q.awaitTermination(300)

    # (1) the maintained statistic equals the batch aggregation
    got_counts = {
        (r.event_type, r.hod, r.val): r.cnt for r in current_counts(counts).collect()
    }
    want_counts = {
        (r.event_type, r.hod, r.val): r.cnt for r in seasonal_counts(ev).collect()
    }
    assert got_counts == want_counts

    # (2) re-flagging the corpus with the final baseline == the batch query
    final_base = seasonal_baseline(current_counts(counts))
    assert _rows(flag_seasonal(ev, final_base)) == _rows(
        t_seasonal_residuals(spark, SF_DIR)
    )

    # (3) every event was flagged exactly once, against the baseline as of
    # its batch: batch-1 rows match a from-scratch computation on the prefix
    out = flagged.read()
    assert out.count() == ev.count()
    want_prefix = _rows(flag_seasonal(prefix, seasonal_baseline(seasonal_counts(prefix))))
    got_prefix = {
        r.event_id: (r.event_type, r.hod, r.value, r.baseline, r.resid, r.is_anom)
        for r in out.collect()
        if r.event_id in want_prefix
    }
    assert got_prefix == want_prefix

    # (4) consolidation preserves the statistic
    consolidate_counts(counts)
    assert {
        (r.event_type, r.hod, r.val): r.cnt for r in current_counts(counts).collect()
    } == want_counts


def test_all_null_cell_rows_survive_flagging(spark):
    """A cell whose readings are all NULL has no counts row and no baseline
    row, but its events must still be emitted (with NULL baseline/resid/
    is_anom) — the batch query's percentile over an all-NULL cell is NULL,
    not absent. Pins the LEFT join in flag_seasonal: an inner join would
    drop such rows from the exactly-once sink forever."""
    ev = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 09:10:00", 1.0),
            (2, "a", "2024-01-01 09:20:00", 3.0),
            (3, "a", "2024-01-01 09:30:00", None),  # null in a live cell
            (4, "b", "2024-01-01 09:40:00", None),  # all-null cell
        ],
        "event_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))

    got = _rows(flag_seasonal(ev, seasonal_baseline(seasonal_counts(ev))))
    # batch semantics, inline (t_seasonal_residuals reads from sf_dir):
    # percentile ignores NULL values but still emits a row per cell.
    e = ev.withColumn("hod", F.hour("ts"))
    base = e.groupBy("event_type", "hod").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("baseline")
    )
    dev = e.join(base, ["event_type", "hod"]).withColumn(
        "resid", F.col("value") - F.col("baseline")
    )
    mad = dev.groupBy("event_type", "hod").agg(
        F.round(F.expr("percentile(abs(resid), 0.5)"), 4).alias("mad")
    )
    want = _rows(
        dev.join(mad, ["event_type", "hod"]).select(
            "event_id",
            "event_type",
            "hod",
            "value",
            "baseline",
            F.round("resid", 4).alias("resid"),
            (F.abs(F.col("resid")) > 4 * F.col("mad")).cast("int").alias("is_anom"),
        )
    )
    assert set(got) == {1, 2, 3, 4}
    assert got == want
    assert got[4] == ("b", 9, None, None, None, None)


def test_epoch_replay_is_idempotent(spark, tmpdirs):
    _, _, wh = tmpdirs
    ev = load_table(spark, SF_DIR, "events").limit(200)
    counts = ParquetTable(spark, f"{wh}/counts2")
    update_seasonal_counts(ev, counts, epoch=0)
    once = {
        (r.event_type, r.hod, r.val): r.cnt for r in current_counts(counts).collect()
    }
    update_seasonal_counts(ev, counts, epoch=0)  # replayed delivery
    twice = {
        (r.event_type, r.hod, r.val): r.cnt for r in current_counts(counts).collect()
    }
    assert once == twice
