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

    ``rebuild_gold=True`` additionally DELETES the range's Gold rows first
    (delete-and-reinsert — the path for a Gold logic change, where anti-join
    idempotence would otherwise keep the stale rows). VERT_TS rows are
    keyed to the day via T; VERT spread definitions are day-independent and
    insert-new semantics keep them stable.
    """
    days = [
        r["date"]
        for r in (
            bronze.select(
                F.to_date(F.timestamp_millis(F.col("received_at"))).alias("date")
            )
            .filter(F.col("date").between(start, end))
            .distinct()
            .orderBy("date")
            .collect()
        )
    ]
    if rebuild_gold and vert_ts_table.exists():
        kept = vert_ts_table.read().filter(~F.to_date("T").between(start, end))
        vert_ts_table.overwrite_versioned(kept)
    for day in days:
        day_batch = bronze.filter(
            F.to_date(F.timestamp_millis(F.col("received_at"))) == F.lit(day)
        )
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
