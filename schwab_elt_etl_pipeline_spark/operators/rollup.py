"""Hierarchical time-series rollups (hypertable-style continuous aggregates).

A 100 TB metrics store never re-aggregates raw data to serve coarse grains:
it maintains a cascade of materialized rollups (1 min → 5 min → 1 h → 1 d)
where each level re-aggregates the PARTIALS of the level below. That works
only if every measure is decomposable:

- count/sum: sum of partials (sums over exact DECIMAL, so the cascade is
  order-independent and equals a direct aggregate bit-for-bit);
- min/max: min/max of partials;
- first/last: carried as (ts, value) argmin/argmax pairs;
- mean: derived at read time from (sum, count) — never averaged directly.

``rollup_minutes`` produces the finest grain from raw events;
``rollup_coarser`` re-aggregates any rollup level to a coarser aligned grain.
The reference's OHLC tables keep only fixed 1-min/daily grains fetched
upstream (tools/schwab.py:956,999); the cascade generalizes that to arbitrary
aligned grains with exact re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEASURES = ("n", "sum_value", "min_value", "max_value")


def bucket_ts(ts: Column | str, minutes: int) -> Column:
    """Truncate a timestamp to an aligned ``minutes`` bucket (divisor of 60:
    hour-boundary aligned, so coarser aligned grains nest exactly)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    if 60 % minutes != 0 and minutes % 60 != 0:
        raise ValueError(f"bucket of {minutes} min does not nest in the hour cascade")
    # Column-API expressions throughout (never interpolate ``ts`` into SQL
    # text — a Column argument would embed its repr and fail analysis).
    if minutes >= 60:
        if minutes % 60:
            raise ValueError("grains over an hour must be whole hours")
        hours = minutes // 60
        if hours == 1:
            return F.date_trunc("hour", c)
        return F.date_trunc("hour", c) - F.make_interval(
            hours=F.hour(c) % F.lit(hours)
        )
    return F.date_trunc("minute", c) - F.make_interval(
        mins=F.minute(c) % F.lit(minutes)
    )


def rollup_minutes(
    events: DataFrame,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    minutes: int = 1,
) -> DataFrame:
    """Finest-grain rollup from raw rows: one partial row per (keys, bucket).

    ``sum_value`` stays DECIMAL so every later re-aggregation is exact.
    """
    return (
        events.groupBy(*keys, bucket_ts(ts, minutes).alias("bucket_ts"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value).cast("decimal(18,6)")).alias("sum_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        )
    )


def rollup_coarser(rollup: DataFrame, keys: list[str], minutes: int) -> DataFrame:
    """Re-aggregate a finer rollup's partials to an aligned coarser grain.

    Input must carry the MEASURES columns of :func:`rollup_minutes`. No raw
    data is touched — this is the cascade step a continuous aggregate runs.
    """
    return (
        rollup.groupBy(*keys, bucket_ts("bucket_ts", minutes).alias("bucket_ts"))
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def rollup_read(rollup: DataFrame) -> DataFrame:
    """Read-time projection: derived mean from exact (sum, count), DOUBLE
    output types (hash-stable across engines)."""
    return rollup.select(
        *[c for c in rollup.columns if c not in MEASURES],
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").alias("min_value"),
        F.col("max_value").alias("max_value"),
        (F.col("sum_value").cast("double") / F.col("n")).alias("avg_value"),
    )
