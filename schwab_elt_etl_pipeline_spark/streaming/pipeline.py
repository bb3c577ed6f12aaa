"""Streaming Silver: tick stream → incremental OPT/OPTM maintenance.

The reference runs Silver as a scheduled stored procedure over the day's
parquet (SURVEY §3.1). Structured Streaming collapses ingestion + Silver into
one incremental pipeline: each micro-batch runs the same ``plans.silver``
logic via ``foreachBatch`` against warehouse tables, with the anti-join /
insert-only-MERGE guarantees providing exactly-once-effective writes even
when a batch is replayed after failure (SURVEY T8 — dedup against the full
target, not watermark state, because late data is accepted at any delay,
docs/sql_server.md:91-96).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from schwab_elt_etl_pipeline_spark.plans.silver import (
    build_opt,
    build_optm_increment,
    parse_quotes,
)
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable


def run_streaming_silver(
    quotes_stream: DataFrame,
    opt_table: ParquetTable,
    optm_table: ParquetTable,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain OPT + OPTM incrementally from a tick stream.

    Per micro-batch: parse/filter ticks (P3/P4/P9, F2/F4), insert-new
    contracts into OPT (J3), resolve OPT_ID (broadcast J4), MAX-dedup marks
    (A7) and insert-new into OPTM (J7 insert-only) — all set-based, so a
    replayed batch inserts zero rows.
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        parsed = parse_quotes(batch)
        if parsed.isEmpty():
            return
        if opt_table.exists():
            new_opt = build_opt(parsed, opt_table.read())
            opt_table.insert_new(new_opt, keys=["Strike", "CP", "Expiry"])
        else:
            opt_table.overwrite_versioned(build_opt(parsed))
        increment = build_optm_increment(parsed, opt_table.read())
        optm_table.insert_new(increment, keys=["OPT_ID", "T"])

    writer = quotes_stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
