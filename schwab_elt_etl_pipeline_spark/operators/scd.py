"""Slowly-changing-dimension maintenance (Type 2).

The reference's dimension updates are overwrite-in-place MERGEs (SCD1 — the
account HASH and MARKET_HOURS upserts, tools/db.py:302-314,595-609). A
warehouse also needs the versioned form: SCD2 keeps every historical value
with a validity interval, so facts can join the dimension AS OF their event
time (the same as-of semantics as ``t_asof_enrich``).

Set-based, two shuffles (one per side of the changed-key join), no windows:

  1. changed = updates ⨝ current ON keys WHERE any tracked attr differs
  2. close those current rows (``valid_to`` = the update's effective ts)
  3. append the new versions (open intervals), and pass unchanged rows through

Idempotent by construction: re-applying the same snapshot finds zero changed
rows (attrs equal) and returns the dimension unchanged — same re-run safety
as the anti-join inserts (docs/sql_server.md:91-96).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Open intervals carry a NULL ``valid_to`` (a far-future sentinel like
#: 9999-12-31 overflows nanosecond timestamp ranges in Arrow/pandas tooling).


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_col: str = "effective_at",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Apply an update snapshot to an SCD2 dimension, returning the new table.

    ``current`` must carry ``keys + attrs + valid_from/valid_to/is_current``;
    ``updates`` carries ``keys + attrs + effective_col``. Only rows whose
    tracked ``attrs`` actually changed produce a new version; brand-new keys
    are inserted with an open interval.
    """
    key_list = list(keys)
    live = current.filter(F.col(is_current))
    closed_history = current.filter(~F.col(is_current))

    # One update row per key, or the live join below fans out and produces
    # several open versions per key (dimension corruption). Keep the LATEST
    # change per key — deterministic tiebreak on the attr tuple — matching
    # MERGE semantics for a CDC batch carrying several changes per key.
    deduped = updates.groupBy(*key_list).agg(
        F.max_by(
            F.struct(*attrs, effective_col),
            F.struct(effective_col, *attrs),
        ).alias("_u")
    )
    upd = deduped.select(
        *key_list,
        *[F.col(f"_u.{a}").alias(f"_new_{a}") for a in attrs],
        F.col(f"_u.{effective_col}").alias(effective_col),
    )
    joined = live.join(upd, on=key_list, how="left")
    diffs = [~F.col(a).eqNullSafe(F.col(f"_new_{a}")) for a in attrs]  # null-safe ≠
    any_diff = diffs[0]
    for d in diffs[1:]:
        any_diff = any_diff | d
    # unmatched keys have a NULL effective ts → never "changed"
    changed_pred = any_diff & F.col(effective_col).isNotNull()

    # live rows: either closed (changed) or passed through untouched
    still_open = joined.filter(~changed_pred).select(*live.columns)
    closed_now = (
        joined.filter(changed_pred)
        .withColumn(valid_to, F.col(effective_col))
        .withColumn(is_current, F.lit(False))
        .select(*live.columns)
    )

    # new versions for changed keys + first versions for brand-new keys
    live_keys = live.select(*key_list)
    changed_keys = joined.filter(changed_pred).select(*key_list)
    new_versions = (
        upd.join(changed_keys, on=key_list, how="left_semi")
        .unionByName(upd.join(live_keys, on=key_list, how="left_anti"))
        .select(
            *key_list,
            *[F.col(f"_new_{a}").alias(a) for a in attrs],
            F.col(effective_col).alias(valid_from),
            F.lit(None).cast("timestamp_ntz").alias(valid_to),
            F.lit(True).alias(is_current),
        )
    )
    return (
        closed_history.unionByName(still_open)
        .unionByName(closed_now)
        .unionByName(new_versions.select(*current.columns))
    )


def scd2_init(
    snapshot: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_col: str = "effective_at",
) -> DataFrame:
    """First load: every row becomes an open current version."""
    return snapshot.select(
        *keys,
        *attrs,
        F.col(effective_col).alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
