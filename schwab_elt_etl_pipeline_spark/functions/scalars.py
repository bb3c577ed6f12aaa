"""Scalar helpers: clamps, bucketing, signed prices, outlier flag
(SURVEY F9-F13, §2.5 derived flag).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp(col: Column, lo: Column | float, hi: Column | float) -> Column:
    """``CASE WHEN x<lo THEN lo WHEN x>hi THEN hi ELSE x END`` (SURVEY F10;
    docs/sql_server.md:533-537 clamps spread price to [0, W]).

    NULL-propagating like the T-SQL CASE: Spark's ``least``/``greatest`` skip
    NULL inputs, which would silently turn an unpriced row (e.g. a grid point
    before a leg's first mark) into ``lo``.
    """
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    hi_c = F.lit(hi) if not isinstance(hi, Column) else hi
    return F.when(col.isNull(), None).otherwise(F.least(F.greatest(col, lo_c), hi_c))


def round_to_step(col: Column, step: int | float) -> Column:
    """``ROUND(x/step, 0) * step`` strike bucketing (SURVEY F11;
    docs/sql_server.md:430-431). Spark ``round`` is HALF_UP like T-SQL."""
    return F.round(col / step, 0) * step


def signed_price(instruction: Column, price: Column) -> Column:
    """BUY → −price, otherwise +price (SURVEY A4/F1; sql/opt.sql:295-300 uses
    ``IIF(LEFT(instruction,3)='BUY', -price, price)``)."""
    return F.when(F.substring(instruction, 1, 3) == "BUY", -price).otherwise(price)


def outlier_flag(o: Column, avg_pre: Column, avg_fol: Column, threshold: float = 0.5) -> Column:
    """Reference outlier rule (docs/sql_server.md:484-489): flag 1 when the
    current price deviates more than ``threshold`` from BOTH the trailing and
    leading 5-row averages in the same direction; else 0. NULL averages (series
    edges) compare as non-outliers, matching T-SQL NULL comparison semantics."""
    low = ((avg_pre - o) > threshold) & ((avg_fol - o) > threshold)
    high = ((o - avg_pre) > threshold) & ((o - avg_fol) > threshold)
    return F.when(low | high, F.lit(1)).otherwise(F.lit(0))
