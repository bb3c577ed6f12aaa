"""Streaming orders: nested order documents → normalized graph →
SCHWAB.TRANSACTIONS, maintained incrementally.

The reference polls orders every 10 s, inserts rows with per-row
IF-NOT-EXISTS guards, and re-runs SP_PY_PARSE_TRANSACTIONS which
delete+reinserts the affected transactions (SURVEY §3.3;
tools/db.py:707-1028, sql/opt.sql:282-332). The streaming twin runs the
same set-based logic per micro-batch:

1. ``normalize_order_graph`` explodes the batch into the four flat tables;
   orders and legs UPSERT on their natural keys (a re-polled order's status
   change — WORKING → FILLED — must replace the stored row, or its
   transaction is never built); immutable activities/exec-legs land via
   ``insert_new`` (J9). Replays stay no-ops: the upsert of an identical
   newest row is value-idempotent, the inserts key-idempotent.
2. Transactions are rebuilt ONLY for the orderIds present in the batch from
   the UPDATED tables, then swapped in with the reference's delete+reinsert
   semantics (anti-join out the touched ids, append the rebuilt rows) under
   one atomic version flip.

Scale: per-batch work is proportional to the batch's order count, not the
table sizes — the four inserts are anti-joins on natural keys and the
rebuild touches one batch's worth of orderIds (broadcast semi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from schwab_elt_etl_pipeline_spark.streaming.runner import start_foreach_batch

from schwab_elt_etl_pipeline_spark.operators.merge import newest_per_key
from schwab_elt_etl_pipeline_spark.plans.orders_plan import (
    build_transactions,
    normalize_order_graph,
)
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable


def run_streaming_orders(
    orders_stream: DataFrame,
    orders_table: ParquetTable,
    legs_table: ParquetTable,
    acts_table: ParquetTable,
    xlegs_table: ParquetTable,
    txn_table: ParquetTable,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain the order graph + transactions from a stream of order docs."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        o, l, a, x = normalize_order_graph(batch)
        # orders and legs MUTATE between polls (WORKING → FILLED, adjusted
        # quantities); insert-only would pin the first-seen row forever and
        # the rebuild below — which reads the TABLE — would never see the
        # fill. Upsert with newest-wins (enteredTime, then deterministic
        # tiebreak) mirrors the reference's 10 s re-poll semantics.
        # Executions are immutable → activities/exec-legs stay insert-only.
        orders_table.merge(newest_per_key(o, ["orderId"], "enteredTime"),
                           keys=["orderId"])
        legs_table.merge(l.dropDuplicates(["legId", "orderId"]),
                         keys=["legId", "orderId"])
        acts_table.insert_new(a, keys=["activityId"])
        xlegs_table.insert_new(x, keys=["activityId", "legId"])

        touched = o.select("orderId").distinct()
        rebuilt = build_transactions(
            orders_table.read().join(F.broadcast(touched), "orderId", "left_semi"),
            legs_table.read().join(F.broadcast(touched), "orderId", "left_semi"),
            acts_table.read().join(F.broadcast(touched), "orderId", "left_semi"),
            xlegs_table.read().join(F.broadcast(touched), "orderId", "left_semi"),
        )
        # delete+reinsert by orderId (sql/opt.sql:309-311) as one atomic
        # version flip: existing rows for touched ids drop out, rebuilt rows
        # append. Multi-row orders (per putCall/positionEffect) stay intact.
        if txn_table.exists():
            kept = txn_table.read().join(
                F.broadcast(touched), "orderId", "left_anti"
            )
            txn_table.overwrite_versioned(kept.unionByName(rebuilt))
        else:
            txn_table.overwrite_versioned(rebuilt)

    return start_foreach_batch(
        orders_stream, process_batch, checkpoint_dir, trigger_seconds
    )
