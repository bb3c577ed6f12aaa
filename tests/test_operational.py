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


def test_api_token_upsert_and_validity(spark):
    import datetime as dt

    from schwab_elt_etl_pipeline_spark.plans.operational import (
        upsert_api_tokens,
        valid_access_tokens,
    )

    schema = ("Name string, access_token string, "
              "access_token_expires_at timestamp_ntz")
    t0 = dt.datetime(2024, 6, 17, 9, 0)
    base = spark.createDataFrame(
        [("acct1", "tokA", t0), ("acct2", "tokB", t0)], schema
    )
    tokens = upsert_api_tokens(base)
    # refresh acct1: newer expiry replaces; acct2 untouched; acct3 inserted
    refreshed = spark.createDataFrame(
        [("acct1", "tokA2", dt.datetime(2024, 6, 17, 10, 0)),
         ("acct3", "tokC", dt.datetime(2024, 6, 17, 10, 0))], schema
    )
    merged = upsert_api_tokens(refreshed, tokens)
    rows = {r["Name"]: r["access_token"] for r in merged.collect()}
    assert rows == {"acct1": "tokA2", "acct2": "tokB", "acct3": "tokC"}
    live = valid_access_tokens(merged, dt.datetime(2024, 6, 17, 9, 30))
    assert {r["Name"] for r in live.collect()} == {"acct1", "acct3"}


def test_api_token_upsert_multirow_snapshot_keeps_newest(spark):
    """A snapshot carrying SEVERAL rows per Name must upsert the newest pair
    (max access_token_expires_at), not an arbitrary row."""
    from schwab_elt_etl_pipeline_spark.plans.operational import upsert_api_tokens

    schema = ("Name string, access_token string, "
              "access_token_expires_at timestamp_ntz")
    snap = spark.createDataFrame(
        [("acct1", "stale", dt.datetime(2024, 6, 17, 8, 0)),
         ("acct1", "fresh", dt.datetime(2024, 6, 17, 11, 0)),
         ("acct1", "mid", dt.datetime(2024, 6, 17, 9, 0))], schema
    )
    rows = {r["Name"]: r["access_token"] for r in upsert_api_tokens(snap).collect()}
    assert rows == {"acct1": "fresh"}
    # and through a merge against an existing table
    existing = spark.createDataFrame(
        [("acct1", "old", dt.datetime(2024, 6, 17, 7, 0))], schema
    )
    merged = upsert_api_tokens(snap, existing)
    rows = {r["Name"]: r["access_token"] for r in merged.collect()}
    assert rows == {"acct1": "fresh"}


def test_account_hash_multirow_snapshot_keeps_newest(spark):
    schema = "Name string, Hash string, update_time timestamp_ntz"
    snap = spark.createDataFrame(
        [("acct1", "OLD", dt.datetime(2024, 6, 17, 6)),
         ("acct1", "NEW", dt.datetime(2024, 6, 17, 8))], schema
    )
    rows = {r["Name"]: r["Hash"] for r in upsert_account_hash(snap).collect()}
    assert rows == {"acct1": "NEW"}


def test_merge_full_three_branches(spark):
    from schwab_elt_etl_pipeline_spark.operators.merge import merge_full

    target = spark.createDataFrame(
        [(1, "a", False), (2, "b", False), (3, "c", False)], "k long, v string, del boolean"
    )
    source = spark.createDataFrame(
        [
            (2, "B", False),   # matched → update
            (3, "c2", True),   # matched + delete condition → delete
            (4, "d", False),   # not matched → insert
            (5, "e", True),    # not matched + tombstone → NOT inserted
        ],
        "k long, v string, del boolean",
    )
    out = merge_full(source, target, keys=["k"], delete_condition=F.col("del"))
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {1: "a", 2: "B", 4: "d"}

    # conditional update: only rows passing update_condition change
    out2 = merge_full(
        source, target, keys=["k"],
        delete_condition=F.col("del"),
        update_condition=F.col("v") == "NOPE",
    )
    rows2 = {r["k"]: r["v"] for r in out2.collect()}
    assert rows2 == {1: "a", 2: "b", 4: "d"}  # 2 retained unchanged
