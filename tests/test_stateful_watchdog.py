"""Stateful streaming watchdog test: per-symbol gap strikes persist across
micro-batches (SURVEY T4/T5 as an applyInPandasWithState operator)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

import shutil
import tempfile

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
from schwab_elt_etl_pipeline_spark.streaming.quotes import read_quote_stream
from schwab_elt_etl_pipeline_spark.streaming.stateful import gap_watchdog

BASE = 1_718_640_000_000  # arbitrary epoch-ms anchor


def _tick(sym: str, offset_s: float):
    ms = BASE + int(offset_s * 1000)
    return (ms, sym, 1.0, ms, None, None)


def test_gap_watchdog_two_strikes_across_batches(spark):
    src = tempfile.mkdtemp(prefix="wd_src_")
    ckpt = tempfile.mkdtemp(prefix="wd_ck_")
    try:
        # batch file 1: A healthy at t=0,1; then silent 40s → tick at 41 (strike 1)
        b1 = [_tick("A", 0), _tick("A", 1), _tick("A", 41), _tick("B", 0), _tick("B", 5)]
        # batch file 2 (separate file → separate micro-batch): another 40s gap
        # for A at t=82 → strike 2 → ALERT; B stays healthy
        b2 = [_tick("A", 82), _tick("B", 10)]
        spark.createDataFrame(b1, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(b2, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)

        stream = read_quote_stream(spark, src, max_files_per_trigger=1)
        alerts = gap_watchdog(stream, gap_seconds=30.0, strikes_to_alert=2)
        q = (
            alerts.writeStream.format("memory")
            .queryName("wd_alerts")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

        rows = spark.sql("SELECT * FROM wd_alerts").collect()
        assert len(rows) == 1, rows
        r = rows[0]
        assert r["symbol"] == "A" and r["strikes"] == 2
        assert r["gap_sec"] == 41.0  # 82 - 41
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_drift_watchdog_rebaselines_across_batches(spark):
    """T6: baseline set in batch 1 persists in state; a batch-2 tick drifting
    ≥ threshold emits one resubscribe event and re-baselines, so the next
    tick (within threshold of the NEW baseline) stays quiet."""
    import datetime as dt
    import tempfile
    import time
    import shutil

    from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
    from schwab_elt_etl_pipeline_spark.streaming.stateful import drift_watchdog

    def _ms(mm):
        return int(
            dt.datetime(2024, 6, 17, 14, mm, tzinfo=dt.timezone.utc).timestamp() * 1000
        )

    src = tempfile.mkdtemp(prefix="dr_src_")
    ckpt = tempfile.mkdtemp(prefix="dr_ckpt_")
    try:
        batches = [
            # batch 1: baseline 5500; +20 move stays under the 30-pt threshold
            [
                (_ms(0), "$SPX", None, None, 5500.0, _ms(0)),
                (_ms(1), "$SPX", None, None, 5520.0, _ms(1)),
                (_ms(1), "SPXW  240621C05500000", 20.0, _ms(1), None, None),  # no "3" → ignored
            ],
            # batch 2: 5535 is 35 from the baseline → resubscribe, re-baseline;
            # 5540 is only 5 from the new baseline → quiet
            [
                (_ms(2), "$SPX", None, None, 5535.0, _ms(2)),
                (_ms(3), "$SPX", None, None, 5540.0, _ms(3)),
            ],
        ]
        for b in batches:
            spark.createDataFrame(b, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = (
            spark.readStream.schema(QUOTES_STREAM)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            drift_watchdog(stream, threshold=30.0)
            .writeStream.format("memory")
            .queryName("drift_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM drift_out").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["price"], r["baseline"], r["drift"]) == (5535.0, 5500.0, 35.0)
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)
