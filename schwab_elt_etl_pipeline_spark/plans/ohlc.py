"""OHLC staging → HISTORIC promote (SURVEY §3.2).

Re-expresses ``PYTHON.SP_PY_PROCESS_OHLC`` (sql/opt.sql:347-391): staged
candle rows are deduplicated by GROUP BY over all projected columns (A1),
anti-joined against the historic target on (Dt, Sym) (J3), and appended with
renamed/cast columns (P1, F12). Idempotence comes from the anti-join, so no
staging truncate is needed (S8 collapses away).

Scale: the anti-join shuffles on (Dt, Sym); with the historic table stored
partitioned by date, only the staged days' partitions are scanned. The staged
batch is small (10 days × minutes), so it broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.merge import insert_new


def _project_minute(stage: DataFrame) -> DataFrame:
    """P1 projection+rename of minute staging (sql/opt.sql:374-377)."""
    return stage.filter(F.col("freq") == "MINUTE").select(
        F.col("open").cast("decimal(9,2)").alias("O"),
        F.col("high").cast("decimal(9,2)").alias("H"),
        F.col("low").cast("decimal(9,2)").alias("L"),
        F.col("close").cast("decimal(9,2)").alias("C"),
        F.col("volume").alias("V"),
        F.col("datetime").alias("Dt"),
        F.col("Symbol").alias("Sym"),
    )


def _project_day(stage: DataFrame) -> DataFrame:
    """P1 projection+rename of daily staging (sql/opt.sql:353-358)."""
    return stage.filter(F.col("freq") == "DAY").select(
        F.col("open").cast("decimal(9,2)").alias("O"),
        F.col("high").cast("decimal(9,2)").alias("H"),
        F.col("low").cast("decimal(9,2)").alias("L"),
        F.col("close").cast("decimal(9,2)").alias("C"),
        F.to_date("datetime").alias("Dt"),
        F.col("Symbol").alias("Sym"),
    )


def promote_ohlc(
    stage: DataFrame,
    historic_minute: DataFrame | None = None,
    historic_day: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (new_minute_rows, new_day_rows) to append to the historic
    tables. Dedup within the batch (A1: GROUP BY all columns ≡ DISTINCT) then
    insert-new vs target keyed (Dt, Sym) (sql/opt.sql:362-367,381-386)."""
    minute = _project_minute(stage).dropDuplicates()
    day = _project_day(stage).dropDuplicates()
    if historic_minute is not None:
        minute = insert_new(minute, historic_minute, keys=["Dt", "Sym"], dedup_source=False)
    if historic_day is not None:
        day = insert_new(day, historic_day, keys=["Dt", "Sym"], dedup_source=False)
    return minute, day
