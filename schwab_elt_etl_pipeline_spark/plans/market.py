"""Market-hours calendar: session gating + next-session lookup (SURVEY T7,
O2, J8).

The reference stores a MERGE-maintained calendar (sql/opt.sql:264-273,
tools/db.py:595-609) and queries the next open session with TOP 1 ORDER BY
(tools/db.py:397-483). Session times are 'HH:mm:ss' strings (no SQL TimeType);
comparisons convert to seconds-since-midnight (SURVEY §1.2 time(0) mapping).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.functions.timeutils import seconds_of_day
from schwab_elt_etl_pipeline_spark.operators.merge import merge_upsert


def upsert_market_hours(snapshot: DataFrame, calendar: DataFrame | None = None) -> DataFrame:
    """J8: MERGE by market_date — latest snapshot wins (tools/db.py:595-609)."""
    if calendar is None:
        return snapshot.dropDuplicates(["market_date"])
    return merge_upsert(snapshot, calendar, keys=["market_date"])


def _hms_to_sec(col: F.Column) -> F.Column:
    """'HH:mm:ss' column → seconds since midnight (the string-column analog of
    :func:`seconds_of_day`, which handles timestamp columns)."""
    parts = F.split(col, ":")
    return (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )


def next_session(calendar: DataFrame, after: dt.datetime) -> DataFrame:
    """O2: first open session at-or-after ``after``
    (``SELECT TOP 1 … ORDER BY market_date, session_start``,
    tools/db.py:446-452). A same-day session qualifies while it has not yet
    ended (mirrors the reference's session-end comparison)."""
    after_date = F.lit(after.date())
    after_sec = after.hour * 3600 + after.minute * 60 + after.second
    return (
        calendar.filter(F.col("is_open"))
        .filter(
            (F.col("market_date") > after_date)
            | (
                (F.col("market_date") == after_date)
                & (_hms_to_sec(F.col("session_end")) > F.lit(after_sec))
            )
        )
        .orderBy(F.asc("market_date"), F.asc("session_start"))
        .limit(1)
        .select("market_date", "market_type", "session_start", "session_end")
    )


def in_session(calendar: DataFrame, ts_col: str = "ts") -> F.Column:
    """Join-ready predicate pieces are exposed by P5 helpers; for calendar
    gating join on ``to_date(ts) = market_date`` then apply this column."""
    sod = seconds_of_day(ts_col)
    return (
        F.col("is_open")
        & (sod >= _hms_to_sec(F.col("session_start")))
        & (sod <= _hms_to_sec(F.col("session_end")))
    )
