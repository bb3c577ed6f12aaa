"""Structured Streaming equivalents of the reference's tick-ingestion stack
(SURVEY §2.9): micro-batched partitioned parquet sink, latest-per-key view
with TTL, freshness monitoring with a 2-strike alert."""

from schwab_elt_etl_pipeline_spark.streaming.corpus import (
    curate_stream,
    read_document_stream,
    update_ann_index,
    update_minhash_index,
    update_passage_index,
    update_window_index,
    write_curated_stream,
)
from schwab_elt_etl_pipeline_spark.streaming.monitor import ProgressRecorder
from schwab_elt_etl_pipeline_spark.streaming.quotes import (
    dedup_stream,
    latest_per_key,
    read_quote_stream,
    tick_sessions,
    windowed_candles,
    write_bronze_stream,
)
from schwab_elt_etl_pipeline_spark.streaming.scd_enrich import (
    enrich_batch_asof,
    start_scd2_enrich,
)
from schwab_elt_etl_pipeline_spark.streaming.smooth_stream import (
    cusum_stream,
    ewma_stream,
    recurrence_stream,
)
from schwab_elt_etl_pipeline_spark.streaming.tws_latest import (
    latest_quote_changelog,
)

__all__ = [
    "curate_stream",
    "cusum_stream",
    "dedup_stream",
    "enrich_batch_asof",
    "ewma_stream",
    "latest_per_key",
    "latest_quote_changelog",
    "ProgressRecorder",
    "read_document_stream",
    "read_quote_stream",
    "recurrence_stream",
    "start_scd2_enrich",
    "tick_sessions",
    "update_ann_index",
    "update_minhash_index",
    "update_passage_index",
    "update_window_index",
    "windowed_candles",
    "write_bronze_stream",
    "write_curated_stream",
]
