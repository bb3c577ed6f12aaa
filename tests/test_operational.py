"""Operational-entity tests: balances PK dedup, hash MERGE, log retention."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.plans.operational import (
    append_balances,
    latest_account_hash,
    prune_logs,
    upsert_account_hash,
)
from schwab_elt_etl_pipeline_spark.schemas import BALANCES


def test_balances_pk_dedup(spark):
    t = dt.datetime(2024, 6, 17, 6, 30)
    rows = [
        (t, 1, 0, 1, 0, Decimal("100000.00"), Decimal("50000.00"), Decimal("150000.00")),
        (t, 1, 0, 1, 0, Decimal("100000.00"), Decimal("50000.00"), Decimal("150000.00")),
        (t, 2, 0, 0, 0, Decimal("20000.00"), Decimal("20000.00"), Decimal("20000.00")),
    ]
    snap = spark.createDataFrame(rows, BALANCES)
    bal = append_balances(snap)
    assert bal.count() == 2  # PK dup collapsed
    again = append_balances(snap, bal)
    assert again.count() == 0  # idempotent re-poll


def test_account_hash_merge_and_latest(spark):
    schema = "Name string, Hash string, update_time timestamp_ntz"
    t0, t1 = dt.datetime(2024, 6, 17, 6), dt.datetime(2024, 6, 17, 7)
    hashes = upsert_account_hash(
        spark.createDataFrame([("acct1", "AAA", t0), ("acct2", "BBB", t0)], schema)
    )
    hashes = upsert_account_hash(
        spark.createDataFrame([("acct1", "CCC", t1)], schema), hashes
    )
    rows = {r["Name"]: r["Hash"] for r in hashes.collect()}
    assert rows == {"acct1": "CCC", "acct2": "BBB"}  # update wins, other kept
    top = latest_account_hash(hashes).first()
    assert top["Name"] == "acct1" and top["Hash"] == "CCC"


def test_prune_logs(spark):
    now = dt.datetime(2024, 6, 17, 12)
    logs = spark.createDataFrame(
        [(now - dt.timedelta(days=d), f"msg{d}") for d in (0, 5, 40)],
        "log_time timestamp_ntz, msg string",
    )
    kept = prune_logs(logs, keep_days=30, now=now)
    assert {r["msg"] for r in kept.collect()} == {"msg0", "msg5"}
