"""End-to-end streaming Silver: file tick stream → incremental OPT/OPTM in
warehouse tables, with replay idempotence (SURVEY §3.1 streaming form, T8)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
from decimal import Decimal

import pytest

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
