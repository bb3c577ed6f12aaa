"""Shared foreachBatch launcher — ONE definition of the trigger/checkpoint
contract every micro-batch sink uses (orders, chains, medallion, rollup,
corpus, JDBC). A trigger-handling change made here reaches every sink; the
previous per-module copies could silently drift."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_foreach_batch(
    stream: DataFrame,
    process_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
    output_mode: str | None = None,
) -> StreamingQuery:
    """``foreachBatch`` + checkpoint + trigger: ``trigger_seconds`` gives a
    processing-time trigger (continuous service); None gives availableNow
    (drain-what-exists — backfills and tests)."""
    writer = stream.writeStream
    if output_mode is not None:
        writer = writer.outputMode(output_mode)
    writer = writer.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
