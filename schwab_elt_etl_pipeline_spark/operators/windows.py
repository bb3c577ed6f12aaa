"""Frame-bounded moving averages + outlier flag (SURVEY §2.5 W1-W3).

These three window specs are the analytical core of the reference's Gold layer
(docs/sql_server.md:484-502,562-568). Window functions shuffle once on the
partition keys; all three frames then evaluate in the same sort, so Catalyst
plans a single exchange + sort for the trio — keep partition keys consistent
across the pipeline to avoid re-shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.functions.scalars import outlier_flag


def trailing_avg(
    value: str, partition: Sequence[str], order: str, preceding: int = 5
) -> Column:
    """W1: ``AVG(v) OVER (... ROWS BETWEEN n PRECEDING AND 1 PRECEDING)``
    (docs/sql_server.md:493-497)."""
    w = Window.partitionBy(*partition).orderBy(order).rowsBetween(-preceding, -1)
    return F.avg(value).over(w)


def leading_avg(
    value: str, partition: Sequence[str], order: str, following: int = 5
) -> Column:
    """W2: ``ROWS BETWEEN 1 FOLLOWING AND n FOLLOWING`` (docs/sql_server.md:498-502)."""
    w = Window.partitionBy(*partition).orderBy(order).rowsBetween(1, following)
    return F.avg(value).over(w)


def rolling_avg(
    value: str, partition: Sequence[str], order: str, preceding: int = 10
) -> Column:
    """W3: ``ROWS BETWEEN n PRECEDING AND CURRENT ROW`` (docs/sql_server.md:562-568)."""
    w = Window.partitionBy(*partition).orderBy(order).rowsBetween(-preceding, 0)
    return F.avg(value).over(w)


def with_outlier_flag(
    df: DataFrame,
    value: str,
    partition: Sequence[str],
    order: str,
    threshold: float = 0.5,
    flag_col: str = "OI",
) -> DataFrame:
    """Attach the reference's outlier flag (docs/sql_server.md:484-489):
    1 when the value deviates > threshold from both the 5-row trailing and
    5-row leading averages in the same direction."""
    o = F.col(value)
    # Materialize each windowed average ONCE, then flag from the attribute
    # refs: embedding the window Column straight into the condition would
    # plant a copy of the sliding aggregate per reference (the flag reads
    # each average twice), and Spark does not CSE duplicate window
    # expressions — measured as 2x window work in the executed plan.
    tmp = (
        df.withColumn("_pre_avg", trailing_avg(value, partition, order))
        .withColumn("_fol_avg", leading_avg(value, partition, order))
    )
    return tmp.withColumn(
        flag_col, outlier_flag(o, F.col("_pre_avg"), F.col("_fol_avg"), threshold)
    ).drop("_pre_avg", "_fol_avg")
