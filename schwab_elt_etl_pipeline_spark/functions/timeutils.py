"""Time/timezone functions (SURVEY F4-F8, F19-F20, P5).

The reference stores US/Pacific wall-clock naive timestamps everywhere
(README.md:227, tools/utils.py:85-154) and converts epoch-milliseconds from the
Schwab API to PST via an opaque ITVF (``EpochMsToPST_ITVF``,
docs/sql_server.md:290-291). All equivalents here are native expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PACIFIC = "America/Los_Angeles"

#: The 8 input formats accepted by the reference's parse_datetime
#: (tools/utils.py:22-82): ISO with/without fraction, with/without 'Z' or
#: offset, date-only, and 'MM/dd/yyyy' variants.
MULTI_TS_FORMATS: tuple[str, ...] = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy",
)


def epoch_ms_to_tz_naive(ms: Column | str, tz: str = PACIFIC) -> Column:
    """Epoch-ms → wall-clock TIMESTAMP_NTZ in ``tz`` (SURVEY F4, F7).

    Equivalent of the reference's ``EpochMsToPST_ITVF`` (docs/sql_server.md:290)
    and pandas epoch→Pacific conversions (tools/schwab.py:964-968).
    """
    col = F.col(ms) if isinstance(ms, str) else ms
    return F.from_utc_timestamp(F.timestamp_millis(col), tz).cast("timestamp_ntz")


def parse_multi_format_ts(s: Column | str, formats: tuple[str, ...] = MULTI_TS_FORMATS) -> Column:
    """First-match multi-format timestamp parse (SURVEY F5; tools/utils.py:22-82).

    ``coalesce(try_to_timestamp(col, f) for f in formats)`` — Z/offset-bearing
    formats convert to session time; naive formats parse as-is.
    """
    col = F.col(s) if isinstance(s, str) else s
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(fmt)) for fmt in formats])


def seconds_of_day(ts: Column | str) -> Column:
    """Timestamp → seconds since midnight (replacement for SQL ``TIME(0)``)."""
    col = F.col(ts) if isinstance(ts, str) else ts
    return (F.hour(col) * 3600 + F.minute(col) * 60 + F.second(col)).alias("seconds_of_day")


def time_of_day_between(ts: Column | str, start: str, end: str) -> Column:
    """``CAST(T AS TIME(0)) BETWEEN start AND end`` (SURVEY P5;
    docs/sql_server.md:307,541). ``start``/``end`` are 'HH:mm:ss' strings;
    bounds inclusive, matching T-SQL BETWEEN."""
    def _sec(hms: str) -> int:
        h, m, s = (int(x) for x in hms.split(":"))
        return h * 3600 + m * 60 + s

    sod = seconds_of_day(ts)
    return (sod >= _sec(start)) & (sod <= _sec(end))
