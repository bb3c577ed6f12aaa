"""Streaming orders→transactions: incremental maintenance must equal the
batch build over the same documents, and replay must not duplicate."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

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


def test_status_update_builds_transaction(spark, d):
    """A re-polled order that transitions WORKING → FILLED must replace the
    stored row (upsert, newest wins) so the rebuild sees the fill and the
    transaction finally materializes — insert-only would pin WORKING
    forever and lose the fill."""
    import time

    working = _order(
        "5001",
        status="WORKING",
        legs=[_leg("1", "SELL_TO_OPEN", "SPXW  240621P05500000")],
        acts=[],
    )
    spark.createDataFrame([working], ORDER).coalesce(1).write.parquet(d + "/in")
    time.sleep(1.1)
    filled = _order(
        "5001",
        status="FILLED",
        legs=[_leg("1", "SELL_TO_OPEN", "SPXW  240621P05500000")],
        acts=[_act([_xleg("1", 2.5)])],
    )
    filled["enteredTime"] = "2024-06-17T09:32:00"  # newer poll wins
    spark.createDataFrame([filled], ORDER).coalesce(1).write.mode("append").parquet(
        d + "/in"
    )

    orders_t, legs_t, acts_t, xlegs_t, txn_t = _run(spark, d, "u", "ck_upd")
    (stored,) = orders_t.read().filter("orderId = '5001'").collect()
    assert stored["status"] == "FILLED"
    txns = txn_t.read().filter("orderId = '5001'").collect()
    assert txns, "fill never produced a transaction"

    # replaying the whole feed is value-idempotent (same newest rows win)
    n_orders = orders_t.read().count()
    n_txn = txn_t.read().count()
    stream = spark.readStream.schema(ORDER).option("maxFilesPerTrigger", 1).parquet(
        d + "/in"
    )
    q = run_streaming_orders(
        stream, orders_t, legs_t, acts_t, xlegs_t, txn_t,
        checkpoint_dir=f"{d}/ck_upd2",
    )
    q.awaitTermination(120)
    assert orders_t.read().count() == n_orders
    assert txn_t.read().count() == n_txn
    (stored2,) = orders_t.read().filter("orderId = '5001'").collect()
    assert stored2["status"] == "FILLED"
