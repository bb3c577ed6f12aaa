"""Streaming chains: snapshot documents → SPX_CHAIN rows, incrementally.

The reference pulls a chains snapshot per interval tier (1/5/30 min by DTE,
config.yaml:165-178) and inserts row-at-a-time
(services/schwab_chains_service.py:110-119). The streaming twin consumes
snapshot documents as a stream and per micro-batch: flatten the nested
expiry→strike→option maps (F17) and append with a natural-key guard —
one set-based insert per batch instead of per-row RPCs, replay-idempotent.

Key: a snapshot row is identified by (Strike, CP, Expiry, DTime) — the
contract at its quote instant (sql/chains.sql:12-29 has no PK; the dedup
key is the contract natural key + the IX_SPX_CHAIN_DTime access path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from schwab_elt_etl_pipeline_spark.streaming.runner import start_foreach_batch

from schwab_elt_etl_pipeline_spark.plans.chains import flatten_chains
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable

CHAIN_KEYS = ["Strike", "CP", "Expiry", "DTime"]


def run_streaming_chains(
    chains_stream: DataFrame,
    chain_table: ParquetTable,
    checkpoint_dir: str,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain SPX_CHAIN from a stream of chain snapshot documents."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        chain_table.insert_new(flatten_chains(batch), keys=CHAIN_KEYS)

    return start_foreach_batch(
        chains_stream, process_batch, checkpoint_dir, trigger_seconds
    )
