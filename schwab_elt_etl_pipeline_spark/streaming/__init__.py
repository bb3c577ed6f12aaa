"""Structured Streaming equivalents of the reference's tick-ingestion stack
(SURVEY §2.9): micro-batched partitioned parquet sink, latest-per-key view
with TTL, freshness monitoring with a 2-strike alert."""

from schwab_elt_etl_pipeline_spark.streaming.quotes import (
    dedup_stream,
    latest_per_key,
    read_quote_stream,
    windowed_candles,
    write_bronze_stream,
)

__all__ = [
    "dedup_stream",
    "latest_per_key",
    "read_quote_stream",
    "windowed_candles",
    "write_bronze_stream",
]
