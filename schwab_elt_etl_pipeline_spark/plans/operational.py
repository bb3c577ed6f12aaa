"""Operational entities: balances snapshots, account-hash upsert, log sink
(SURVEY §1.5 tail: sql/opt.sql:215-231,237-244,176-192).

Small tables with big invariants:

- BALANCES: append-only snapshots, PK (ApiCallTime, accountId) — re-polling
  the same instant must not duplicate (tools/db.py insert guards).
- HASH: MERGE on Name, latest hash wins (tools/db.py:302-314).
- PYTHON_LOGS: plain append sink with a retention filter (the reference
  prunes by date; here a filter + overwrite or partition drop).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.merge import (
    insert_new,
    merge_upsert,
    newest_per_key as _newest_per_key,
)


def append_balances(snapshot: DataFrame, balances: DataFrame | None = None) -> DataFrame:
    """New snapshot rows keyed by PK (ApiCallTime, accountId)
    (sql/opt.sql:225-229)."""
    if balances is None:
        return snapshot.dropDuplicates(["ApiCallTime", "accountId"])
    return insert_new(snapshot, balances, keys=["ApiCallTime", "accountId"])


def upsert_account_hash(snapshot: DataFrame, hashes: DataFrame | None = None) -> DataFrame:
    """J8: MERGE on Name — the account-hash lookup table
    (tools/db.py:302-314). Latest snapshot wins per Name: the snapshot is
    pre-reduced to its newest row per Name (by ``update_time``) so a batch
    carrying several rows per Name upserts the newest, not an arbitrary one."""
    newest = _newest_per_key(snapshot, keys=["Name"], order_col="update_time")
    if hashes is None:
        return newest
    return merge_upsert(newest, hashes, keys=["Name"])


def latest_account_hash(hashes: DataFrame) -> DataFrame:
    """O3: ``TOP 1 ORDER BY update_time DESC`` (tools/db.py:140-145)."""
    return hashes.orderBy(F.desc("update_time"), F.asc("Name")).limit(1)


def prune_logs(logs: DataFrame, keep_days: int, now: dt.datetime) -> DataFrame:
    """Retention: drop log rows older than ``keep_days`` (the reference's
    maintenance delete; on partitioned storage this is a partition drop)."""
    cutoff = now - dt.timedelta(days=keep_days)
    return logs.filter(F.col("log_time") >= F.lit(cutoff))


def upsert_api_tokens(snapshot: DataFrame, tokens: DataFrame | None = None) -> DataFrame:
    """J8 MERGE on Name for the SCHWAB.API token table (sql/opt.sql:198-209;
    tokens refreshed by services/tokens_service.py): the newest
    access/refresh token pair per credential name replaces the stored one —
    the snapshot is pre-reduced to its newest row per Name (by
    ``access_token_expires_at``) so multi-row snapshots keep the freshest
    pair, not an arbitrary row."""
    newest = _newest_per_key(
        snapshot, keys=["Name"], order_col="access_token_expires_at"
    )
    if tokens is None:
        return newest
    return merge_upsert(newest, tokens, keys=["Name"])


def valid_access_tokens(tokens: DataFrame, now: dt.datetime) -> DataFrame:
    """Credentials whose access token is still live at ``now``
    (tools/schwab.py:474-490 token_data expiry checks) — the engine-side
    predicate behind 'needs refresh' scheduling."""
    return tokens.filter(
        F.col("access_token").isNotNull()
        & (F.col("access_token_expires_at") > F.lit(now))
    )
