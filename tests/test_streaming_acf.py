"""Stream ≡ batch parity for the incremental ACF moments
(streaming/acf_stream.py vs catalog t_acf_lags) — lag pairs reach through
micro-batch boundaries via the per-user last-K tail."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog.analytics12 import t_acf_lags
from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.acf_stream import (
    acf_from_moments,
    acf_stream,
    current_moments,
    update_acf_moments,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture()
def tmpdirs():
    dirs = [tempfile.mkdtemp(prefix=f"acf_{n}_") for n in ("src", "ck", "wh")]
    yield dirs
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)


def _acf(df):
    return {(r.user_id, r.lag): (r.n_pairs, r.acf) for r in df.collect()}


_SCHEMA = "event_id long, ts timestamp_ntz, user_id long, value double"


def _ev(evid, ts_s, user, val):
    return (evid, datetime(2024, 1, 1, 0, 0, ts_s), user, val)


def test_boundary_pairs_reach_through_batches(spark, tmpdirs):
    """With 2 events per batch and lags up to 3, most pairs straddle the
    boundary — the two-batch drain must equal the one-shot computation."""
    _, _, wh = tmpdirs
    tails = ParquetTable(spark, f"{wh}/tails")
    moments = ParquetTable(spark, f"{wh}/moments")
    rows = [_ev(i, i, 7, float(v)) for i, v in enumerate([1, 5, 2, 8, 3, 9])]
    b1 = spark.createDataFrame(rows[:2], _SCHEMA)
    b2 = spark.createDataFrame(rows[2:4], _SCHEMA)
    b3 = spark.createDataFrame(rows[4:], _SCHEMA)
    for i, b in enumerate((b1, b2, b3), start=1):
        update_acf_moments(b, tails, moments, lags=3, epoch=i)

    one_t = ParquetTable(spark, f"{wh}/tails1")
    one_m = ParquetTable(spark, f"{wh}/moments1")
    update_acf_moments(
        spark.createDataFrame(rows, _SCHEMA), one_t, one_m, lags=3, epoch=1
    )
    got = _acf(acf_from_moments(current_moments(moments)))
    want = _acf(acf_from_moments(current_moments(one_m)))
    assert got == want
    assert got[(7, 1)][0] == 5 and got[(7, 3)][0] == 3  # all pairs counted

    n = moments.read().count()
    update_acf_moments(b3, tails, moments, lags=3, epoch=3)  # replay
    assert moments.read().count() == n
    assert _acf(acf_from_moments(current_moments(moments))) == got


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

    tails = ParquetTable(spark, f"{wh}/tails")
    moments = ParquetTable(spark, f"{wh}/moments")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = acf_stream(stream, tails, moments, ck)
    q.awaitTermination(300)

    got = _acf(acf_from_moments(current_moments(moments)))
    want = _acf(t_acf_lags(spark, SF_DIR))
    assert got == want
