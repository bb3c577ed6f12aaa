"""End-to-end streaming Silver: file tick stream → incremental OPT/OPTM in
warehouse tables, with replay idempotence (SURVEY §3.1 streaming form, T8)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from decimal import Decimal

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.pipeline import run_streaming_silver
from schwab_elt_etl_pipeline_spark.streaming.quotes import read_quote_stream

PT = dt.timezone(dt.timedelta(hours=-7))


def _ms(hh: int, mm: int) -> int:
    return int(dt.datetime(2024, 6, 17, hh, mm, tzinfo=PT).timestamp() * 1000)


def _sym(strike: int) -> str:
    return f"SPXW  240621C{strike * 1000:08d}"


def test_streaming_silver_incremental(spark):
    src = tempfile.mkdtemp(prefix="ssrc_")
    wh = tempfile.mkdtemp(prefix="swh_")
    ckpt = tempfile.mkdtemp(prefix="sck_")
    try:
        rows1 = [
            (_ms(6, 30), _sym(5500), 20.0, _ms(6, 30), None, None),
            (_ms(6, 31), _sym(5500), 21.0, _ms(6, 31), None, None),
            (_ms(6, 30), _sym(5505), 18.0, _ms(6, 30), None, None),
            (_ms(6, 30), "$SPX", None, None, 5500.0, _ms(6, 30)),  # filtered
        ]
        spark.createDataFrame(rows1, QUOTES_STREAM).write.mode("append").parquet(src)

        opt = ParquetTable(spark, f"{wh}/opt")
        optm = ParquetTable(spark, f"{wh}/optm")
        q = run_streaming_silver(read_quote_stream(spark, src), opt, optm, ckpt)
        q.awaitTermination(180)

        assert opt.read().count() == 2
        assert optm.read().count() == 3
        marks = {
            (r["OPT_ID"], r["T"]): r["O"] for r in optm.read().collect()
        }
        assert Decimal("21.00") in set(marks.values())

        # second day's worth: one duplicate tick (replay) + one new contract
        rows2 = [
            (_ms(6, 31), _sym(5500), 21.0, _ms(6, 31), None, None),  # dup
            (_ms(6, 32), _sym(5510), 15.0, _ms(6, 32), None, None),  # new
        ]
        spark.createDataFrame(rows2, QUOTES_STREAM).write.mode("append").parquet(src)
        q2 = run_streaming_silver(read_quote_stream(spark, src), opt, optm, ckpt)
        q2.awaitTermination(180)

        assert opt.read().count() == 3  # one new contract
        assert optm.read().count() == 4  # dup tick inserted nothing
    finally:
        for d in (src, wh, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_medallion_incremental_gold(spark):
    """Bronze→Silver→Gold from the stream: batch 1 builds spreads for the
    day; batch 2 (replay + new strike) adds only new VERT/VERT_TS rows; a
    third run with no new files changes nothing (exactly-once-effective)."""
    import time

    from schwab_elt_etl_pipeline_spark.streaming.pipeline import run_streaming_medallion

    src = tempfile.mkdtemp(prefix="smsrc_")
    wh = tempfile.mkdtemp(prefix="smwh_")
    ckpt = tempfile.mkdtemp(prefix="smck_")
    try:
        # strikes 5500..5515 step 5: pairs at width 5 exist at every T
        def ticks(minute, strikes, base):
            rows = [
                (_ms(6, minute), _sym(s), base + i, _ms(6, minute), None, None)
                for i, s in enumerate(strikes)
            ]
            rows.append((_ms(6, minute), "$SPX", None, None, 5505.0, _ms(6, minute)))
            return rows

        rows1 = ticks(30, [5500, 5505, 5510], 20.0) + ticks(31, [5500, 5505, 5510], 21.0)
        spark.createDataFrame(rows1, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)

        tables = {
            n: ParquetTable(spark, f"{wh}/{n}")
            for n in ("opt", "optm", "und", "vert", "vert_ts")
        }

        def run():
            q = run_streaming_medallion(
                read_quote_stream(spark, src),
                tables["opt"], tables["optm"], tables["und"],
                tables["vert"], tables["vert_ts"], ckpt, width=5,
            )
            q.awaitTermination(240)

        run()
        n_vert1 = tables["vert"].read().count()
        n_ts1 = tables["vert_ts"].read().count()
        assert n_vert1 >= 2  # (5500,5505) and (5505,5510) call spreads
        assert n_ts1 >= n_vert1  # ≥ one priced row per spread
        # keys unique
        assert tables["vert_ts"].read().select("VID", "T").distinct().count() == n_ts1

        # batch 2: replayed tick + a new strike extends the chain
        time.sleep(1.1)
        rows2 = ticks(31, [5500], 21.0) + ticks(32, [5515], 24.0)
        spark.createDataFrame(rows2, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)
        run()
        n_vert2 = tables["vert"].read().count()
        n_ts2 = tables["vert_ts"].read().count()
        assert n_vert2 > n_vert1  # (5510,5515) spread appears
        assert n_ts2 > n_ts1
        assert tables["vert_ts"].read().select("VID", "T").distinct().count() == n_ts2

        # replay with nothing new: no growth
        run()
        assert tables["vert"].read().count() == n_vert2
        assert tables["vert_ts"].read().count() == n_ts2
    finally:
        for d in (src, wh, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_medallion_underlying_only_batch_completes_gold(spark):
    """Batch 1: option ticks only (no $SPX → Gold can't run). Batch 2: only
    the underlying marks. Gold for the day must be built by batch 2 — the
    day-loop is driven by BOTH tick days and underlying days."""
    import time

    from schwab_elt_etl_pipeline_spark.streaming.pipeline import run_streaming_medallion

    src = tempfile.mkdtemp(prefix="smu_src_")
    wh = tempfile.mkdtemp(prefix="smu_wh_")
    ckpt = tempfile.mkdtemp(prefix="smu_ck_")
    try:
        opts = [
            (_ms(6, 30), _sym(s), 20.0 + i, _ms(6, 30), None, None)
            for i, s in enumerate([5500, 5505, 5510])
        ] + [
            (_ms(6, 31), _sym(s), 21.0 + i, _ms(6, 31), None, None)
            for i, s in enumerate([5500, 5505, 5510])
        ]
        und = [(_ms(6, 30), "$SPX", None, None, 5505.0, _ms(6, 30))]
        spark.createDataFrame(opts, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)

        tables = {
            n: ParquetTable(spark, f"{wh}/{n}")
            for n in ("opt", "optm", "und", "vert", "vert_ts")
        }

        def run():
            q = run_streaming_medallion(
                read_quote_stream(spark, src),
                tables["opt"], tables["optm"], tables["und"],
                tables["vert"], tables["vert_ts"], ckpt, width=5,
            )
            q.awaitTermination(240)

        run()
        assert not tables["vert_ts"].exists()  # no underlying yet → no Gold

        time.sleep(1.1)
        spark.createDataFrame(und, QUOTES_STREAM).coalesce(1).write.mode("append").parquet(src)
        run()  # underlying-only batch
        assert tables["vert_ts"].exists() and tables["vert_ts"].read().count() > 0
    finally:
        for d in (src, wh, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_streaming_silver_from_json_transport(spark):
    """Transport swap (SURVEY S3): the SAME Silver pipeline runs off
    newline-delimited JSON messages (byte-compatible with a socket/Kafka
    value column) and produces the same OPT/OPTM as the parquet feed —
    including dropping malformed messages and symbol-less records."""
    import json
    import os

    src = tempfile.mkdtemp(prefix="jsrc_")
    wh = tempfile.mkdtemp(prefix="jwh_")
    ckpt = tempfile.mkdtemp(prefix="jck_")
    try:
        msgs = [
            {"received_at": _ms(6, 30), "symbol": _sym(5500), "37": 20.0, "38": _ms(6, 30)},
            {"received_at": _ms(6, 31), "symbol": _sym(5500), "37": 21.0, "38": _ms(6, 31)},
            {"received_at": _ms(6, 30), "symbol": _sym(5505), "37": 18.0, "38": _ms(6, 30)},
            {"received_at": _ms(6, 30), "symbol": "$SPX", "3": 5500.0, "35": _ms(6, 30)},
        ]
        with open(os.path.join(src, "ticks.jsonl"), "w") as fh:
            for m in msgs:
                fh.write(json.dumps(m) + "\n")
            fh.write("this is not json\n")          # poison pill: dropped
            fh.write(json.dumps({"received_at": 1}) + "\n")  # no symbol: dropped

        opt = ParquetTable(spark, f"{wh}/opt")
        optm = ParquetTable(spark, f"{wh}/optm")
        stream = read_quote_stream(spark, src, fmt="json-files")
        q = run_streaming_silver(stream, opt, optm, ckpt)
        q.awaitTermination(180)

        assert opt.read().count() == 2
        assert optm.read().count() == 3
        marks = {r["O"] for r in optm.read().collect()}
        assert Decimal("21.00") in marks

        # replaying the same JSON through a fresh checkpoint inserts nothing
        ckpt2 = tempfile.mkdtemp(prefix="jck2_")
        try:
            q2 = run_streaming_silver(
                read_quote_stream(spark, src, fmt="json-files"), opt, optm, ckpt2
            )
            q2.awaitTermination(180)
            assert optm.read().count() == 3
        finally:
            shutil.rmtree(ckpt2, ignore_errors=True)
    finally:
        for d in (src, wh, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_socket_and_unknown_formats(spark):
    """The socket transport builds a streaming plan through the same JSON
    decode (no server needed to construct it); unknown formats fail fast."""
    df = read_quote_stream(spark, fmt="socket", options={"host": "localhost", "port": 9999})
    assert df.isStreaming and df.schema.fieldNames() == [
        "received_at", "symbol", "37", "38", "3", "35"
    ]
    with pytest.raises(ValueError, match="unknown quote-stream format"):
        read_quote_stream(spark, "/tmp/x", fmt="carrier-pigeon")
