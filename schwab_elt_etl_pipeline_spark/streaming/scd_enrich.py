"""Streaming facts enriched AS-OF event time against an SCD2 dimension.

The reference keeps dimensions current-only (SCD1 overwrite MERGEs,
tools/db.py:302-314,595-609) and enriches in stored procedures against
whatever the dimension holds at run time — replays after a dimension change
silently re-label history. The SCD2 stream enrichment fixes that: each fact
joins the dimension VERSION valid at its event time, so replays are
bit-stable no matter when they run.

Pattern: ``foreachBatch`` + per-batch dimension snapshot.

- The dimension is a versioned warehouse table (``sources/warehouse.py``);
  each micro-batch reads the CURRENT version once — snapshot isolation means
  a concurrent dimension writer can never tear a batch (every row of the
  batch joins the same dimension version).
- The join is equi on the business keys with the validity interval as a
  residual range predicate — hash-joinable, and broadcast when the dimension
  fits (a dimension that is small relative to the stream is the common case;
  pass ``broadcast_dim=False`` for a billion-row dimension and the planner
  falls back to a keyed shuffle join).
- The sink is dup-guarded (``insert_new`` on the fact key), so batch
  replays after a crash are exactly-once-effective — the same discipline as
  ``streaming/jdbc_sink.py``.

A plain stream-static join cannot express this correctly: the static plan
would pin ONE dimension snapshot for the whole query lifetime, not pick up
versions committed while the stream runs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable

#: Far-future close for open intervals, applied only inside the join
#: predicate (the stored NULL valid_to stays NULL).
_OPEN_END = "9999-01-01"


def enrich_batch_asof(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    event_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    broadcast_dim: bool = True,
) -> DataFrame:
    """One batch of facts left-joined to the dimension version valid at each
    fact's ``event_ts`` (facts with no valid version keep NULL attributes —
    they surface in DQ rather than silently dropping)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    d = d.alias("_dim")
    f = facts.alias("_f")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"_f.{k}") == F.col(f"_dim.{k}"))
    ts = F.col(f"_f.{event_ts}")
    cond = (
        cond
        & (ts >= F.col(f"_dim.{valid_from}"))
        & (
            ts
            < F.coalesce(
                F.col(f"_dim.{valid_to}"),
                F.lit(_OPEN_END).cast("timestamp_ntz"),
            )
        )
    )
    dim_payload = [
        c for c in dim.columns if c not in (*keys, valid_from, valid_to, "is_current")
    ]
    # A payload column whose name already exists on the fact side keeps the
    # fact column and lands as "dim_<name>" — a silent duplicate name would
    # kill every downstream write (COLUMN_ALREADY_EXISTS) or the sink's
    # anti-join (AMBIGUOUS_REFERENCE).
    fact_cols = set(facts.columns)
    return f.join(d, cond, "left").select(
        "_f.*",
        *[
            F.col(f"_dim.{c}").alias(f"dim_{c}" if c in fact_cols else c)
            for c in dim_payload
        ],
    )


def start_scd2_enrich(
    stream: DataFrame,
    dim_table: ParquetTable,
    sink_table: ParquetTable,
    keys: Sequence[str],
    event_ts: str,
    fact_keys: Sequence[str],
    checkpoint_dir: str,
    broadcast_dim: bool = True,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Run the enrichment as a stream: per batch, snapshot the dimension,
    as-of join, dup-guarded insert into the sink."""

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        dim = dim_table.read()
        enriched = enrich_batch_asof(
            batch, dim, keys, event_ts, broadcast_dim=broadcast_dim
        )
        sink_table.insert_new(enriched, keys=list(fact_keys))

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
