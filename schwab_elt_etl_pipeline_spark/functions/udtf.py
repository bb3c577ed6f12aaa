"""Python UDTF surface (SURVEY §2.10) — lateral table functions on Spark 4.

The reference exposes its symbol parser as a SQL Server inline table-valued
function consumed via ``CROSS APPLY`` (``ParseSPXSymbol_ITVF``,
docs/sql_server.md:250,292). The engine's FAST path is the native column
expression (:func:`functions.symbols.parse_option_symbol`) — it inlines into
whole-stage codegen and costs nothing extra. This module provides the same
semantics as a registered Python UDTF for the cases a table function is the
right API:

- SQL-first users who want ``... , LATERAL parse_option_symbol(symbol)`` —
  the literal CROSS APPLY shape of the reference query;
- table functions that return a VARIABLE number of rows per input (an
  expression cannot), demonstrated by :class:`ExpandStrikeLadder` — the
  per-underlying strike-universe generator (tools/schwab.py:1158-1201) as a
  lateral join instead of a driver-side loop.

UDTFs run row-at-a-time in Python workers; keep them OFF relational hot
paths (the catalog queries all use the native expressions) and reserve them
for API parity and genuinely variable-arity expansion.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

from pyspark.sql.functions import udtf


@udtf(returnType="Strike INT, CP SMALLINT, Expiry DATE")
class ParseOptionSymbol:
    """CROSS APPLY twin of ``parse_option_symbol``: one row per option
    symbol, NO row for non-option symbols (the ITVF's empty-result contract,
    docs/sql_server.md:250 — the expression form instead yields nulls)."""

    def eval(self, symbol: str) -> Iterator[tuple[int, int, dt.date]]:
        if symbol is None or len(symbol) != 21:
            return
        expiry_raw, cp_char, strike_raw = symbol[6:12], symbol[12], symbol[13:21]
        if cp_char not in "CP" or not (expiry_raw + strike_raw).isdigit():
            return
        try:
            expiry = dt.datetime.strptime(expiry_raw, "%y%m%d").date()
        except ValueError:
            return
        yield int(strike_raw) // 1000, 1 if cp_char == "C" else -1, expiry


@udtf(returnType="Strike INT, CP SMALLINT, symbol STRING")
class ExpandStrikeLadder:
    """Variable-arity expansion: the strike universe around one underlying
    mark (tools/schwab.py:1158-1201) as a lateral table function — each input
    row (spx, range, step, expiry yyMMdd, root) fans out to
    2 × (range/step + 1)-ish rows, a shape no column expression can emit."""

    def eval(
        self, spx: float, strike_range: int, strike_step: int, expiry: str, root: str
    ) -> Iterator[tuple[int, int, str]]:
        if None in (spx, strike_range, strike_step, expiry, root):
            return  # NULL args yield no rows, never a worker TypeError
        if strike_step <= 0:
            return
        lo = int((spx - strike_range) // strike_step) * strike_step
        hi = -int(-(spx + strike_range) // strike_step) * strike_step
        for strike in range(lo, hi + 1, strike_step):
            for cp, letter in ((1, "C"), (-1, "P")):
                yield (
                    strike,
                    cp,
                    f"{root:<6}{expiry}{letter}{strike * 1000:08d}",
                )


def register_udtfs(spark) -> None:
    """Register both table functions for SQL ``LATERAL`` use (idempotent)."""
    spark.udtf.register("parse_option_symbol", ParseOptionSymbol)
    spark.udtf.register("expand_strike_ladder", ExpandStrikeLadder)
