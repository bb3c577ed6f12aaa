"""Streaming → SQL-database sink, exactly-once-effective.

The reference's production loop is exactly this: a quote/order stream landing
in SQL Server with per-row ``IF NOT EXISTS`` guards (tools/db.py feeding from
services/schwab_stream.py). Structured Streaming's contract is at-least-once
per micro-batch into foreachBatch, so the sink makes effects idempotent
instead: every batch goes through :func:`sources/jdbc.insert_new_jdbc` —
anti-join on the natural key against the current table, append only the new
rows. A replayed batch (failure/restart, same data) inserts ZERO rows, which
upgrades at-least-once delivery to exactly-once EFFECTS without any sink-side
transaction coordination — the same pattern the parquet warehouse sinks use
(``streaming/rollup_stream.py``), pointed at JDBC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from schwab_elt_etl_pipeline_spark.streaming.runner import start_foreach_batch

from schwab_elt_etl_pipeline_spark.sources.jdbc import DERBY_DRIVER, insert_new_jdbc


def write_stream_jdbc(
    stream: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    checkpoint_dir: str,
    driver: str = DERBY_DRIVER,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Run a stream into a JDBC table with replay-idempotent inserts."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        insert_new_jdbc(batch, url, table, keys=keys, driver=driver)

    return start_foreach_batch(
        stream, process_batch, checkpoint_dir, trigger_seconds
    )
