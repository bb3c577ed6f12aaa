"""transformWithState latest-quote changelog.

The full streaming path needs google.protobuf (pyspark's transformWithState
state-server proto), absent from this container — the end-to-end test is
skip-marked (same discipline as the optional-codec multimodal tests) and
the processor's reduction semantics are pinned directly against a fake
ValueState."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
from schwab_elt_etl_pipeline_spark.streaming.tws_latest import (
    LatestQuoteProcessor,
    latest_quote_changelog,
    required_confs,
    tws_available,
)

BASE = 1718634600000


class _FakeState:
    def __init__(self) -> None:
        self.value = None

    def exists(self) -> bool:
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v) -> None:
        self.value = tuple(v)


def _feed(proc: LatestQuoteProcessor, sym: str, ticks: list[tuple[int, float]]):
    pdf = pd.DataFrame({"ts_ms": [t for t, _ in ticks], "mark": [m for _, m in ticks]})
    return list(proc.handleInputRows((sym,), iter([pdf]), None))


def _mk() -> LatestQuoteProcessor:
    proc = LatestQuoteProcessor()
    proc._latest = _FakeState()
    return proc


def test_emits_newest_of_batch_only():
    proc = _mk()
    out = _feed(proc, "A", [(BASE, 10.0), (BASE + 2000, 11.0), (BASE + 1000, 10.5)])
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["symbol"], row["ts_ms"], row["mark"]) == ("A", BASE + 2000, 11.0)
    assert proc._latest.value == (BASE + 2000, 11.0)


def test_stale_and_duplicate_batches_are_silent():
    proc = _mk()
    _feed(proc, "A", [(BASE + 2000, 11.0)])
    assert _feed(proc, "A", [(BASE + 2000, 11.0)]) == []  # duplicate
    assert _feed(proc, "A", [(BASE + 1500, 99.0)]) == []  # out-of-order
    assert proc._latest.value == (BASE + 2000, 11.0)  # view untouched
    out = _feed(proc, "A", [(BASE + 3000, 12.0)])  # genuine advance
    assert out and out[0].iloc[0]["ts_ms"] == BASE + 3000


def test_all_null_timestamps_yield_nothing():
    proc = _mk()
    pdf = pd.DataFrame({"ts_ms": [None, None], "mark": [1.0, 2.0]})
    assert list(proc.handleInputRows(("A",), iter([pdf]), None)) == []
    assert proc._latest.value is None


@pytest.mark.skipif(
    not tws_available(), reason="google.protobuf not installed in this container"
)
def test_changelog_end_to_end(spark):
    for key, value in required_confs.items():
        spark.conf.set(key, value)
    src = tempfile.mkdtemp(prefix="tws_src_")
    sink = tempfile.mkdtemp(prefix="tws_sink_")
    ckpt = tempfile.mkdtemp(prefix="tws_ckpt_")
    try:
        rows = [
            (BASE, "A", 10.0, BASE, None, None),
            (BASE + 2000, "A", 11.0, BASE + 2000, None, None),
            (BASE + 500, "B", 20.0, BASE + 500, None, None),
        ]
        spark.createDataFrame(rows, QUOTES_STREAM).write.mode("append").parquet(src)
        stream = spark.readStream.schema(QUOTES_STREAM).parquet(src)
        q = (
            latest_quote_changelog(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["symbol"], r["ts_ms"], r["mark"])
            for r in spark.read.parquet(sink).collect()
        }
        assert got == {("A", BASE + 2000, 11.0), ("B", BASE + 500, 20.0)}
    finally:
        for d in (src, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)
