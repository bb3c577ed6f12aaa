"""Streaming chains snapshots: incremental SPX_CHAIN maintenance equals the
batch flatten, and replayed/overlapping snapshots insert zero new rows."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

from schwab_elt_etl_pipeline_spark.plans.chains import flatten_chains
from schwab_elt_etl_pipeline_spark.schemas import CHAIN_DOC
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.chains_stream import run_streaming_chains

_OPT = {
    "bid": 2.4, "ask": 2.6, "totalVolume": 120,
    "quoteTimeInLong": 1718640000000,
    "volatility": 14.5, "delta": -0.45, "gamma": 0.002, "theta": -0.9,
    "vega": 1.2, "rho": -0.05, "openInterest": 5000,
    "optionRoot": "SPXW", "daysToExpiration": 4,
}


def _doc(quote_ms: int):
    o = dict(_OPT, quoteTimeInLong=quote_ms)
    return {
        "callExpDateMap": {"2024-06-21:4": {"5500.0": [dict(o, delta=0.55)]}},
        "putExpDateMap": {"2024-06-21:4": {"5500.0": [o], "5495.0": [o]}},
    }


@pytest.fixture()
def d():
    p = tempfile.mkdtemp(prefix="ch_")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def test_streaming_chains_appends_and_dedups(spark, d):
    t1, t2 = 1718640000000, 1718640060000
    spark.createDataFrame([_doc(t1)], CHAIN_DOC).coalesce(1).write.parquet(d + "/in")
    time.sleep(1.1)
    # second snapshot: one minute later PLUS a replay of the first instant
    spark.createDataFrame([_doc(t2), _doc(t1)], CHAIN_DOC).coalesce(1).write.mode(
        "append"
    ).parquet(d + "/in")

    table = ParquetTable(spark, d + "/chain")
    q = run_streaming_chains(
        spark.readStream.schema(CHAIN_DOC).option("maxFilesPerTrigger", 1).parquet(d + "/in"),
        table,
        checkpoint_dir=d + "/ckpt",
    )
    q.awaitTermination(120)

    got = table.read()
    # 3 contracts × 2 distinct instants; the replayed t1 snapshot added nothing
    assert got.count() == 6
    expected = flatten_chains(
        spark.createDataFrame([_doc(t1), _doc(t2)], CHAIN_DOC)
    )
    cols = expected.columns
    rows = lambda df: sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    assert rows(got.select(*cols)) == rows(expected)
