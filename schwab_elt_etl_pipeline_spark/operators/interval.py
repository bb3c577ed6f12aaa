"""Point-in-interval joins without cross products.

Spark has no native interval-join operator (Flink/QuestDB do); the naive
``points.join(intervals, point BETWEEN start AND end)`` plans a nested-loop
over every (point, interval) pair in each equi-key group — quadratic in the
hot keys. The scale-safe shape, same trick as the band join in
``plans/gold.py``: quantize time into buckets no smaller than the maximum
interval length, explode each interval onto the buckets it covers, and
equi-join points on (keys…, bucket) with the BETWEEN as a residual predicate.
Each interval covers ≤ ⌈len/W⌉+1 buckets, so the join fan-out is bounded and
the whole thing is one hash/sort-merge join that AQE can plan like any other.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: Sequence[str],
    max_interval_seconds: int,
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` keys) whose
    ``[start_ts, end_ts]`` contains ``point_ts``.

    ``max_interval_seconds`` must bound ``end_ts - start_ts`` (checked at
    runtime via a filter — intervals longer than the bound are rejected so the
    bucket math stays sound). A point's bucket is unique, and an interval of
    length ≤ W spans at most 2 width-W buckets, so each (point, interval)
    match is produced exactly once and the pre-filter fan-out is ≤ 2×.

    Inner join only: the BETWEEN residual is applied after the bucket
    equi-join, which would silently drop null-extended rows of an outer
    join. An outer variant needs the residual inside the join condition;
    compose it from this inner join + an anti-join if needed.
    """
    w = int(max_interval_seconds)
    if w <= 0:
        raise ValueError("max_interval_seconds must be positive")

    p_bucket = (F.unix_timestamp(F.col(point_ts)) / w).cast("long")
    i_lo = (F.unix_timestamp(F.col(start_ts)) / w).cast("long")
    i_hi = (F.unix_timestamp(F.col(end_ts)) / w).cast("long")

    iv = (
        intervals.filter(
            F.unix_timestamp(F.col(end_ts)) - F.unix_timestamp(F.col(start_ts))
            <= F.lit(w)
        )
        .withColumn("_bucket", F.explode(F.sequence(i_lo, i_hi)))
    )
    pt = points.withColumn("_bucket", p_bucket)
    joined = pt.join(iv, on=[*on, "_bucket"], how="inner").filter(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    )
    return joined.drop("_bucket")
