"""Idempotent set-based merge primitives.

The reference guarantees idempotence with three per-row patterns (SURVEY §2.3):
anti-join inserts (`WHERE T.key IS NULL`, sql/opt.sql:362-367), per-row
``IF NOT EXISTS`` guards (tools/db.py:707-1028), and T-SQL ``MERGE``
(docs/sql_server.md:317-329, tools/db.py:302-314). All three collapse to two
set-based operators here, which is also where most of the throughput headroom
over the reference comes from (BASELINE.md notes): one shuffle instead of one
RPC per row.

Scale notes:
- ``insert_new``/``merge_upsert`` shuffle both sides on the key columns; at
  100 TB, store targets partitioned by a date-derived column so only the
  affected partitions are read (partition pruning) and pass ``broadcast_source``
  when the incoming batch is small relative to the target.
- Surrogate keys are deterministic hashes of the natural key (xxhash64), NOT
  ``monotonically_increasing_id()`` — ids must be stable across re-runs and
  executors for MERGE idempotence (SURVEY §4 item 2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str) -> Column:
    """Deterministic 64-bit surrogate id from a natural key.

    Replaces IDENTITY columns (``OPT_ID``/``VID``/``activityId``,
    sql/opt.sql:102,178). xxhash64 is a JVM-side codegen'd expression; collision
    probability over realistic key cardinalities (<1e9) is negligible and is
    asserted against in tests.
    """
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def insert_new(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
    dedup_source: bool = True,
    broadcast_target_keys: bool = False,
) -> DataFrame:
    """Rows of ``source`` whose key is absent from ``target`` (SURVEY J3/J9).

    The set-based generalization of ``INSERT … WHERE NOT EXISTS``: append the
    result to the target to get an idempotent load. ``dedup_source`` collapses
    duplicate keys *within* the batch first (reference guards row-by-row, so
    only the first occurrence lands — ``dropDuplicates`` keeps an arbitrary
    one; callers needing MAX-per-key should pre-aggregate).

    ``broadcast_target_keys`` hints broadcasting the target's key projection —
    right only when the target's distinct keyset is small; a large target's
    keyset must shuffle.
    """
    src = (source.dropDuplicates(list(keys)) if dedup_source else source).alias(
        "_ins_src"
    )
    tgt_keys = target.select(*keys).alias("_ins_tgt")
    if broadcast_target_keys:
        tgt_keys = F.broadcast(tgt_keys)
    # NULL-SAFE key equality: with plain `=`, a row whose key column is NULL
    # never matches its already-inserted copy, so it re-inserts on EVERY
    # batch/replay — unbounded duplicates for exactly the rows the key was
    # meant to guard (e.g. a chain snapshot with no quote time). <=> is
    # hash-joinable, so the plan shape is unchanged.
    cond = None
    for k in keys:
        c = F.col(f"_ins_src.{k}").eqNullSafe(F.col(f"_ins_tgt.{k}"))
        cond = c if cond is None else cond & c
    return src.join(tgt_keys, cond, "left_anti")


def newest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Reduce a batch to its newest row per key BEFORE an upsert: window
    rank by ``order_col`` DESC with every remaining column as deterministic
    tiebreaker (plain ``dropDuplicates`` keeps an arbitrary row when one
    batch carries several rows per key — an upsert must apply the newest)."""
    from pyspark.sql.window import Window

    rest = [c for c in df.columns if c not in keys and c != order_col]
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), *[F.desc(c) for c in rest]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
    insert_only: bool = False,
) -> DataFrame:
    """Plain-parquet MERGE shim (SURVEY J7/J8).

    Returns the merged table contents: matched keys take the source row
    (update) unless ``insert_only``; unmatched source rows are inserted;
    unmatched target rows are retained. Equivalent to Delta ``MERGE INTO``
    with whenMatchedUpdate/whenNotMatchedInsert (docs/sql_server.md:315-329);
    on plain parquet the caller overwrites the target with the result.

    ``insert_only`` mirrors the OPTM merge (`WHEN NOT MATCHED INSERT` only,
    docs/sql_server.md:317-329).
    """
    if insert_only:
        return target.unionByName(insert_new(source, target, keys))
    updated_or_new = source.dropDuplicates(list(keys))
    retained = target.join(updated_or_new.select(*keys), on=list(keys), how="left_anti")
    return retained.unionByName(updated_or_new.select(*target.columns))


def merge_full(
    source: DataFrame,
    target: DataFrame,
    keys: Sequence[str],
    delete_condition: Column | None = None,
    update_condition: Column | None = None,
) -> DataFrame:
    """Full three-branch MERGE (T-SQL ``MERGE`` parity, docs/sql_server.md:
    315-329): WHEN MATCHED [AND update_condition] THEN UPDATE · WHEN MATCHED
    AND delete_condition THEN DELETE · WHEN NOT MATCHED THEN INSERT.

    Conditions are evaluated on the SOURCE row of a matched pair (the
    tombstone/update payload): a matched key is deleted when
    ``delete_condition`` holds, updated when ``update_condition`` holds (or
    always, if None), otherwise the target row is retained unchanged.
    Returns the merged table contents — same overwrite contract as
    :func:`merge_upsert`, one key-shuffle total (the branches are column
    expressions over a single join, not three passes).
    """
    src = source.dropDuplicates(list(keys))
    del_cond = delete_condition if delete_condition is not None else F.lit(False)
    upd_cond = update_condition if update_condition is not None else F.lit(True)

    # Matched pairs resolve in one join: tag each source row with its action.
    actioned = src.withColumn(
        "_action",
        F.when(del_cond, F.lit("delete"))
        .when(upd_cond, F.lit("update"))
        .otherwise(F.lit("keep_target")),
    )
    key_actions = actioned.select(*keys, "_action")

    tgt = target.join(key_actions, on=list(keys), how="left")
    retained_target = tgt.filter(
        F.col("_action").isNull() | (F.col("_action") == "keep_target")
    ).select(*target.columns)

    updates = (
        actioned.filter(F.col("_action") == "update")
        .join(target.select(*keys), on=list(keys), how="inner")
        .select(*target.columns)
    )
    inserts = (
        actioned.filter(F.col("_action") != "delete")
        .join(target.select(*keys), on=list(keys), how="left_anti")
        .select(*target.columns)
    )
    return retained_target.unionByName(updates).unionByName(inserts)
