"""Historical backfill / reprocessing over the medallion warehouse.

The operational twin of `streaming/pipeline.py`: when Gold logic changes, a
partition is corrupted, or late data arrives beyond the stream's horizon, a
date range is recomputed FROM BRONZE through the exact same batch unit the
stream runs (`apply_medallion_batch`) — one definition of the increment, so
backfill and live ingestion cannot drift. All writes are anti-join keyed:
re-running a backfill, or backfilling days the stream already ingested,
inserts zero duplicate rows.

Scale shape: the Bronze scan is partition-pruned to the requested dates
(Bronze is written ``partitionBy("date")``); each day then runs the same
touched-day Gold rebuild as streaming. Days process sequentially by design —
each day's Gold read must observe the prior day's committed writes (the
warehouse pointer-flip is the commit point); the parallelism WITHIN a day is
the cluster's, not the loop's.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.pipeline import apply_medallion_batch


def backfill_medallion(
    bronze: DataFrame,
    opt_table: ParquetTable,
    optm_table: ParquetTable,
    underlying_table: ParquetTable,
    vert_table: ParquetTable,
    vert_ts_table: ParquetTable,
    start: dt.date,
    end: dt.date,
    width: int = 5,
    opt_range: int = 100,
    rebuild_gold: bool = False,
) -> list[dt.date]:
    """Re-run Silver+Gold for every Bronze day in [start, end]. Returns the
    days processed.

    ``rebuild_gold=True`` additionally DELETES the Gold rows of the
    EVENT-time days this Bronze slice produces (delete-and-reinsert — the
    path for a Gold logic change, where anti-join idempotence would
    otherwise keep the stale rows). The deleted day set is derived from the
    slice's parsed T values, never from the ingest-date window: T is
    Pacific event time, and the two calendars diverge around midnight and
    for late-replayed data. VERT spread definitions are day-independent and
    insert-new semantics keep them stable.
    """
    # filter on the Bronze PARTITION column when present: write_bronze_stream
    # partitions by a materialized `date`, and filtering the derived
    # expression instead would full-scan Bronze once per day (Catalyst can't
    # map an expression over received_at back to the partition key)
    date_expr = (
        F.col("date")
        if "date" in bronze.columns
        else F.to_date(F.timestamp_millis(F.col("received_at")))
    )
    days = [
        r["d"]
        for r in (
            bronze.select(date_expr.alias("d"))
            .filter(F.col("d").between(start, end))
            .distinct()
            .orderBy("d")
            .collect()
        )
    ]
    if rebuild_gold and vert_ts_table.exists() and days:
        # delete by the EVENT-time days this slice actually produces: T is
        # Pacific wall-clock from the quote timestamp while `days` is keyed
        # on ingest date — deleting a bare start..end T-range would purge
        # days the loop below never rebuilds (late-replayed or tz-shifted
        # data would be lost for good)
        from schwab_elt_etl_pipeline_spark.plans.silver import parse_quotes

        range_batch = bronze.filter(date_expr.between(start, end))
        t_days = [
            r["d"]
            for r in parse_quotes(range_batch)
            .select(F.to_date("T").alias("d"))
            .distinct()
            .collect()
        ]
        if t_days:
            kept = vert_ts_table.read().filter(~F.to_date("T").isin(t_days))
            vert_ts_table.overwrite_versioned(kept)
    for day in days:
        day_batch = bronze.filter(date_expr == F.lit(day))
        apply_medallion_batch(
            day_batch,
            opt_table,
            optm_table,
            underlying_table,
            vert_table,
            vert_ts_table,
            width=width,
            opt_range=opt_range,
        )
    return days
