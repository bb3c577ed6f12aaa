"""Streaming orders→transactions: incremental maintenance must equal the
batch build over the same documents, and replay must not duplicate."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from schwab_elt_etl_pipeline_spark.plans.orders_plan import (
    build_transactions,
    normalize_order_graph,
)
from schwab_elt_etl_pipeline_spark.schemas import ORDER
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.orders_stream import run_streaming_orders
from tests.test_plans_ohlc_orders_chains import _act, _leg, _order, _xleg


@pytest.fixture()
def d():
    p = tempfile.mkdtemp(prefix="ord_")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _docs_batch1():
    return [
        _order(
            "1001",
            legs=[
                _leg("1", "SELL_TO_OPEN", "SPXW  240621P05500000"),
                _leg("2", "BUY_TO_OPEN", "SPXW  240621P05495000"),
            ],
            acts=[_act([_xleg("1", 2.5), _xleg("2", 1.0)])],
        ),
    ]


def _docs_batch2():
    return [
        _order(
            "2001",
            strategy="OCO",
            children=[
                _order(
                    "2002",
                    legs=[_leg("1", "SELL_TO_CLOSE", "SPXW  240621P05500000")],
                    acts=[_act([_xleg("1", 3.0)])],
                )
            ],
        ),
        _order("3001", status="CANCELED",
               legs=[_leg("1", "BUY_TO_OPEN", "SPXW  240621P05490000")]),
    ]


def _tables(spark, d, tag):
    return [
        ParquetTable(spark, f"{d}/{tag}_{n}")
        for n in ("orders", "legs", "acts", "xlegs", "txn")
    ]


def _run(spark, d, tag, ckpt):
    stream = spark.readStream.schema(ORDER).option("maxFilesPerTrigger", 1).parquet(
        d + "/in"
    )
    tables = _tables(spark, d, tag)
    q = run_streaming_orders(stream, *tables, checkpoint_dir=f"{d}/{ckpt}")
    q.awaitTermination(120)
    return tables


def test_streaming_orders_equals_batch(spark, d):
    import time

    spark.createDataFrame(_docs_batch1(), ORDER).coalesce(1).write.parquet(d + "/in")
    time.sleep(1.1)
    spark.createDataFrame(_docs_batch2(), ORDER).coalesce(1).write.mode(
        "append"
    ).parquet(d + "/in")

    tables = _run(spark, d, "t", "ckpt")
    txn = tables[-1].read()

    all_docs = spark.createDataFrame(_docs_batch1() + _docs_batch2(), ORDER)
    expected = build_transactions(*normalize_order_graph(all_docs))
    cols = expected.columns

    def rows(df):
        return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

    exp_rows = rows(expected)
    assert rows(txn.select(*cols)) == exp_rows
    # filled vertical + flattened OCO child present; parent/canceled absent
    ids = {r["orderId"] for r in txn.collect()}
    assert ids == {"1001", "2002"}

    # replay from a fresh checkpoint into the SAME tables: no duplicates
    tables2 = _run(spark, d, "t", "ckpt2")
    txn2 = tables2[-1].read()
    assert rows(txn2.select(*cols)) == exp_rows
