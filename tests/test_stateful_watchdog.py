"""Stateful streaming watchdog test: per-symbol gap strikes persist across
micro-batches (SURVEY T4/T5 as an applyInPandasWithState operator)."""

from __future__ import annotations

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
