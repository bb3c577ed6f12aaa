"""Streaming tests (SURVEY §5.4): T1-T3 micro-batch sink, daily partitioning,
latest-per-key, freshness metrics, 2-strike alerting."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
from schwab_elt_etl_pipeline_spark.streaming import (
    dedup_stream,
    latest_per_key,
    read_quote_stream,
    write_bronze_stream,
)
from schwab_elt_etl_pipeline_spark.streaming.freshness import (
    TwoStrikeMonitor,
    freshness_metrics,
)


def _ms(day: int, hh: int, mm: int) -> int:
    return int(
        dt.datetime(2024, 6, day, hh, mm, tzinfo=dt.timezone.utc).timestamp() * 1000
    )


@pytest.fixture()
def tick_rows():
    return [
        (_ms(17, 14, 0), "SPXW  240621C05500000", 20.0, _ms(17, 14, 0), None, None),
        (_ms(17, 14, 1), "SPXW  240621C05500000", 21.0, _ms(17, 14, 1), None, None),
        (_ms(18, 14, 0), "SPXW  240621C05505000", 18.0, _ms(18, 14, 0), None, None),
        (_ms(18, 14, 2), "$SPX", None, None, 5502.0, _ms(18, 14, 2)),
    ]


def test_bronze_stream_partitions_by_date(spark, tick_rows):
    src = tempfile.mkdtemp(prefix="ticks_src_")
    sink = tempfile.mkdtemp(prefix="ticks_sink_")
    ckpt = tempfile.mkdtemp(prefix="ticks_ckpt_")
    try:
        spark.createDataFrame(tick_rows, QUOTES_STREAM).write.mode("append").parquet(src)
        stream = read_quote_stream(spark, src)
        assert stream.isStreaming
        q = write_bronze_stream(stream, sink, ckpt)
        q.awaitTermination(120)

        out = spark.read.parquet(sink)
        assert out.count() == 4
        days = {r["date"] for r in out.select("date").distinct().collect()}
        assert days == {dt.date(2024, 6, 17), dt.date(2024, 6, 18)}  # T2 rotation
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_latest_per_key_with_ttl(spark, tick_rows):
    quotes = spark.createDataFrame(tick_rows, QUOTES_STREAM)
    latest = latest_per_key(quotes, ttl_seconds=600)
    rows = {r["symbol"]: r for r in latest.collect()}
    # only symbols within 600s of the horizon (day-18 records) survive
    assert set(rows) == {"SPXW  240621C05505000", "$SPX"}
    # latest wins per key
    assert rows["$SPX"]["3"] == 5502.0

    # TTL large enough → day-17 symbols reappear, and the 21.0 (latest) tick wins
    latest_all = latest_per_key(quotes, ttl_seconds=10 * 24 * 3600)
    rows_all = {r["symbol"]: r for r in latest_all.collect()}
    assert rows_all["SPXW  240621C05500000"]["37"] == 21.0


def test_watermarked_stream_dedup(spark, tick_rows):
    import tempfile

    src = tempfile.mkdtemp(prefix="dd_src_")
    ckpt = tempfile.mkdtemp(prefix="dd_ck_")
    try:
        # duplicate every tick (same symbol + quote time, later arrival)
        dups = [(r[0] + 1000, r[1], r[2], r[3], r[4], r[5]) for r in tick_rows]
        spark.createDataFrame(tick_rows + dups, QUOTES_STREAM).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = dedup_stream(read_quote_stream(spark, src), watermark="1 hour")
        q = (
            stream.writeStream.format("memory")
            .queryName("dd_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT symbol, `38` FROM dd_out").collect()
        assert len(out) == len(tick_rows)  # each (symbol, quote-time) once
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_freshness_metrics_and_two_strike(spark, tick_rows):
    quotes = spark.createDataFrame(tick_rows, QUOTES_STREAM)
    now = _ms(18, 14, 2)
    m = freshness_metrics(quotes, now_ms=now, fresh_seconds=150).first()
    # SPXW symbols only: 5500 (day 17 → stale) and 5505 (120s old → fresh)
    assert m["n_symbols"] == 2 and m["n_fresh"] == 1 and m["n_stale"] == 1

    mon = TwoStrikeMonitor()
    assert mon.observe(True) is False  # strike 1
    assert mon.observe(True) is True  # strike 2 → alert
    assert mon.observe(True) is False  # counter reset after alert
    mon2 = TwoStrikeMonitor()
    assert mon2.observe(True) is False
    assert mon2.observe(False) is False  # healthy poll resets
    assert mon2.observe(True) is False  # needs 2 consecutive again


def test_windowed_candles_batch_semantics(spark):
    from schwab_elt_etl_pipeline_spark.streaming import windowed_candles

    rows = [
        (_ms(17, 14, 0), "SPXW  240621C05500000", 20.0, _ms(17, 14, 0), None, None),
        (_ms(17, 14, 0) + 30_000, "SPXW  240621C05500000", 22.0, _ms(17, 14, 0) + 30_000, None, None),
        (_ms(17, 14, 0) + 45_000, "SPXW  240621C05500000", 19.0, _ms(17, 14, 0) + 45_000, None, None),
        (_ms(17, 14, 1), "SPXW  240621C05500000", 21.0, _ms(17, 14, 1), None, None),
        (_ms(17, 14, 0), "$SPX", None, None, 5500.0, _ms(17, 14, 0)),  # no mark → dropped
    ]
    quotes = spark.createDataFrame(rows, QUOTES_STREAM)
    candles = {
        (r["symbol"], r["window_start"]): r
    for r in windowed_candles(quotes, "1 minute").collect()}
    first = candles[("SPXW  240621C05500000", dt.datetime(2024, 6, 17, 14, 0))]
    assert (first["O"], first["H"], first["L"], first["C"], first["V"]) == (20.0, 22.0, 19.0, 19.0, 3)
    second = candles[("SPXW  240621C05500000", dt.datetime(2024, 6, 17, 14, 1))]
    assert (second["O"], second["C"], second["V"]) == (21.0, 21.0, 1)
    assert len(candles) == 2  # markless equity row contributed nothing


def test_windowed_candles_stream_drops_late_ticks(spark):
    """Micro-batched file stream (maxFilesPerTrigger=1): a tick arriving two
    batches after the watermark passed it must be dropped, not resurrect its
    window. Two-watermark semantics (SPARK-40925): late-event FILTERING uses
    the previous batch's watermark while EVICTION uses the current one, so
    the drop takes effect one batch after the watermark advances — hence
    three batches here."""
    import time

    from schwab_elt_etl_pipeline_spark.streaming import windowed_candles

    src = tempfile.mkdtemp(prefix="wc_src_")
    ckpt = tempfile.mkdtemp(prefix="wc_ckpt_")
    try:
        batches = [
            # batch 0: establishes max event time 14:30 → watermark 14:25
            [
                (_ms(17, 14, 0), "SPXW  240621C05500000", 20.0, _ms(17, 14, 0), None, None),
                (_ms(17, 14, 30), "SPXW  240621C05500000", 25.0, _ms(17, 14, 30), None, None),
            ],
            # batch 1: watermark 14:25 now active for eviction
            [(_ms(17, 14, 31), "SPXW  240621C05500000", 26.0, _ms(17, 14, 31), None, None)],
            # batch 2: 14:05 tick is now late for FILTERING too → dropped
            [
                (_ms(17, 14, 5), "SPXW  240621C05500000", 99.0, _ms(17, 14, 5), None, None),
                (_ms(17, 14, 32), "SPXW  240621C05500000", 27.0, _ms(17, 14, 32), None, None),
            ],
        ]
        for b in batches:
            spark.createDataFrame(b, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)  # distinct mtimes → deterministic file order

        stream = (
            spark.readStream.schema(QUOTES_STREAM)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        q = (
            windowed_candles(stream, "1 minute", "5 minutes")
            .writeStream.format("memory")
            .queryName("wc_out")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        dropped = sum(
            (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0) if p["stateOperators"] else 0)
            for p in q.recentProgress
        )
        assert dropped == 1  # exactly the 99.0 straggler
        got = {
            r["window_start"]: r for r in spark.sql("SELECT * FROM wc_out").collect()
        }
        # finalized + emitted: only the 14:00 window (end 14:01 ≤ final wm 14:27)
        assert dt.datetime(2024, 6, 17, 14, 0) in got
        assert got[dt.datetime(2024, 6, 17, 14, 0)]["V"] == 1
        # the late 99.0 tick must not have produced a candle
        assert dt.datetime(2024, 6, 17, 14, 5) not in got
        # 14:3x windows not finalized (watermark < window end) → absent
        assert dt.datetime(2024, 6, 17, 14, 30) not in got
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_bronze_schema_drift_conforms(spark):
    """SURVEY §1.3: daily stream files are a ragged union of record shapes
    (options carry fields 37/38, equities 3/35, plus whatever else
    accumulated). mergeSchema + conform_to_schema normalizes them onto the
    QUOTES_STREAM contract with typed nulls for absent fields."""
    from pyspark.sql import types as T

    from schwab_elt_etl_pipeline_spark.sources import read_bronze_quotes

    src = tempfile.mkdtemp(prefix="drift_src_")
    try:
        day1 = T.StructType(
            [
                T.StructField("received_at", T.LongType()),
                T.StructField("symbol", T.StringType()),
                T.StructField("37", T.DoubleType()),
                T.StructField("38", T.LongType()),
            ]
        )
        day2 = T.StructType(
            [
                T.StructField("received_at", T.LongType()),
                T.StructField("symbol", T.StringType()),
                T.StructField("3", T.DoubleType()),
                T.StructField("35", T.LongType()),
                T.StructField("debug_tag", T.StringType()),  # stray extra col
            ]
        )
        spark.createDataFrame(
            [(_ms(17, 14, 0), "SPXW  240621C05500000", 20.0, _ms(17, 14, 0))], day1
        ).coalesce(1).write.mode("append").parquet(src)
        spark.createDataFrame(
            [(_ms(18, 14, 0), "$SPX", 5500.0, _ms(18, 14, 0), "x")], day2
        ).coalesce(1).write.mode("append").parquet(src)

        out = read_bronze_quotes(spark, src)
        assert [f.name for f in out.schema.fields] == list(QUOTES_STREAM.fieldNames())
        assert [f.dataType for f in out.schema.fields] == [
            f.dataType for f in QUOTES_STREAM.fields
        ]
        rows = {r["symbol"]: r for r in out.collect()}
        assert rows["SPXW  240621C05500000"]["37"] == 20.0
        assert rows["SPXW  240621C05500000"]["3"] is None  # typed null fill
        assert rows["$SPX"]["3"] == 5500.0
        assert rows["$SPX"]["37"] is None
        assert "debug_tag" not in out.columns  # extras dropped
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_stream_restart_resumes_from_checkpoint(spark, tick_rows):
    """T10: a restarted query resumes from the checkpoint — files already
    committed are not reprocessed, new files are, and the sink stays
    duplicate-free. (The reference's reconnect/backoff loop becomes this.)"""
    src = tempfile.mkdtemp(prefix="rs_src_")
    sink = tempfile.mkdtemp(prefix="rs_sink_")
    ckpt = tempfile.mkdtemp(prefix="rs_ckpt_")
    try:
        day17 = [r for r in tick_rows if r[0] < _ms(18, 0, 0)]
        day18 = [r for r in tick_rows if r[0] >= _ms(18, 0, 0)]
        spark.createDataFrame(day17, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)

        q1 = write_bronze_stream(read_quote_stream(spark, src), sink, ckpt)
        q1.awaitTermination(120)
        assert spark.read.parquet(sink).count() == len(day17)

        # second run, same checkpoint: only the new file is picked up
        spark.createDataFrame(day18, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)
        q2 = write_bronze_stream(read_quote_stream(spark, src), sink, ckpt)
        q2.awaitTermination(120)

        out = spark.read.parquet(sink)
        assert out.count() == len(tick_rows)  # no reprocessing, no gaps
        # every (symbol, received_at) exactly once
        assert out.select("symbol", "received_at").distinct().count() == len(tick_rows)
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_tick_sessions_batch_and_stream(spark):
    """Session windows: ticks within the gap merge, a gap splits sessions;
    the same expression runs batch and (with watermark) streaming."""
    from schwab_elt_etl_pipeline_spark.streaming import tick_sessions

    sym = "SPXW  240621C05500000"
    rows = [
        (_ms(17, 14, 0), sym, 20.0, _ms(17, 14, 0), None, None),
        (_ms(17, 14, 1), sym, 21.0, _ms(17, 14, 1), None, None),  # +1min: same session
        (_ms(17, 14, 30), sym, 25.0, _ms(17, 14, 30), None, None),  # +29min: new session
    ]
    quotes = spark.createDataFrame(rows, QUOTES_STREAM)
    out = {r["session_start"]: r for r in tick_sessions(quotes, gap="2 minutes").collect()}
    assert len(out) == 2
    s1 = out[dt.datetime(2024, 6, 17, 14, 0)]
    assert s1["n_ticks"] == 2 and s1["first_mark"] == 20.0 and s1["last_mark"] == 21.0
    # session end = last event + gap (session_window semantics)
    assert s1["session_end"] == dt.datetime(2024, 6, 17, 14, 3)
    s2 = out[dt.datetime(2024, 6, 17, 14, 30)]
    assert s2["n_ticks"] == 1

    # streaming: two batches; watermark from batch-2 sentinel finalizes
    # batch-1's sessions (append mode emits only closed sessions)
    src = tempfile.mkdtemp(prefix="sess_src_")
    ckpt = tempfile.mkdtemp(prefix="sess_ckpt_")
    sink = tempfile.mkdtemp(prefix="sess_sink_")
    try:
        spark.createDataFrame(rows, QUOTES_STREAM).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        late = [(_ms(18, 9, 0), sym, 30.0, _ms(18, 9, 0), None, None)]
        spark.createDataFrame(late, QUOTES_STREAM).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = read_quote_stream(spark, src, max_files_per_trigger=1)
        q = (
            tick_sessions(stream, gap="2 minutes", watermark="1 minute")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.read.parquet(sink)
        starts = {r["session_start"] for r in emitted.collect()}
        assert dt.datetime(2024, 6, 17, 14, 0) in starts
        assert dt.datetime(2024, 6, 17, 14, 30) in starts
    finally:
        for d in (src, ckpt, sink):
            shutil.rmtree(d, ignore_errors=True)


def test_progress_recorder_captures_batches(spark, tick_rows):
    """StreamingQueryListener observability: per-batch progress lands in the
    recorder, flattens to a typed DataFrame, and flushes idempotently."""
    import time

    from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
    from schwab_elt_etl_pipeline_spark.streaming.monitor import ProgressRecorder

    src = tempfile.mkdtemp(prefix="mon_src_")
    sink = tempfile.mkdtemp(prefix="mon_sink_")
    ckpt = tempfile.mkdtemp(prefix="mon_ckpt_")
    wh = tempfile.mkdtemp(prefix="mon_wh_")
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        spark.createDataFrame(tick_rows, QUOTES_STREAM).write.mode("append").parquet(src)
        q = write_bronze_stream(read_quote_stream(spark, src), sink, ckpt)
        q.awaitTermination(120)
        # listener bus is async: wait briefly for progress delivery
        for _ in range(40):
            if rec.to_df(spark).count() > 0:
                break
            time.sleep(0.25)
        prog = rec.to_df(spark)
        rows = prog.collect()
        assert rows, "no progress events captured"
        assert sum(r["num_input_rows"] for r in rows) == len(tick_rows)
        assert all(r["batch_duration_ms"] >= 0 for r in rows)

        t = ParquetTable(spark, f"{wh}/progress")
        n = rec.flush_to(t)
        assert n == len(rows)
        assert t.read().count() == n
        assert rec.flush_to(t) == 0  # buffer cleared; second flush is a no-op
    finally:
        spark.streams.removeListener(rec)
        for d in (src, sink, ckpt, wh):
            shutil.rmtree(d, ignore_errors=True)


def test_observed_dq_metrics_in_progress(spark, tick_rows):
    """df.observe() DQ counters attached to a stream surface per-batch in
    the progress recorder's `observed` column — metered streaming with zero
    extra passes (operators/quality.py observed_rules doc contract)."""
    import json as _json
    import time

    from schwab_elt_etl_pipeline_spark.operators.quality import observed_rules
    from schwab_elt_etl_pipeline_spark.streaming.monitor import ProgressRecorder

    src = tempfile.mkdtemp(prefix="obsq_src_")
    sink = tempfile.mkdtemp(prefix="obsq_sink_")
    ckpt = tempfile.mkdtemp(prefix="obsq_ckpt_")
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        spark.createDataFrame(tick_rows, QUOTES_STREAM).write.mode("append").parquet(src)
        stream = read_quote_stream(spark, src)
        # observed_rules detects the streaming frame and switches to the
        # string-name observe() variant (Observation objects are batch-only);
        # the per-batch counters surface in observedMetrics, not a handle
        observed, obs = observed_rules(
            stream, {"symbol_present": F.col("symbol").isNotNull()}, name="dq"
        )
        assert obs is None  # streaming: read metrics from progress events
        q = write_bronze_stream(observed, sink, ckpt)
        q.awaitTermination(120)
        for _ in range(40):
            if rec.to_df(spark).count() > 0:
                break
            time.sleep(0.25)
        rows = rec.to_df(spark).collect()
        assert rows
        got = [_json.loads(r["observed"]) for r in rows if r["observed"] != "{}"]
        assert got, "no observedMetrics captured"
        total = sum(m["dq"]["n_rows"] for m in got if "dq" in m)
        viol = sum(m["dq"]["viol_symbol_present"] for m in got if "dq" in m)
        assert total == len(tick_rows) and viol == 0
    finally:
        spark.streams.removeListener(rec)
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)
