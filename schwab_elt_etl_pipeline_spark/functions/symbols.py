"""Option-symbol parse / generate (SURVEY F2, F3).

Symbol format (reference tools/schwab.py:1179-1200):

    "{root:<6}{yyMMdd}{C|P}{strike*1000:08d}"  e.g. "SPXW  260813C06000000"

- root left-justified to 6 chars ("SPXW" → "SPXW  ").
- expiry as yyMMdd.
- C for call (CP=+1), P for put (CP=-1) (services/schwab_chains_service.py:72).
- strike × 1000, zero-padded to 8 digits.

The reference parses this with an opaque SQL Server ITVF
(``ParseSPXSymbol_ITVF``, docs/sql_server.md:250,292); here both directions are
pure Spark column expressions, so they inline into codegen and push down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_option_symbol(symbol: Column | str) -> Column:
    """``symbol -> struct<Strike int, CP short, Expiry date>``.

    Returns nulls inside the struct for non-option symbols (e.g. "$SPX"),
    mirroring the CROSS APPLY producing no usable row (docs/sql_server.md:250).
    """
    s = F.col(symbol) if isinstance(symbol, str) else symbol
    is_opt = s.rlike(r"^.{6}\d{6}[CP]\d{8}$")
    expiry = F.when(is_opt, F.to_date(F.substring(s, 7, 6), "yyMMdd"))
    cp = F.when(is_opt, F.when(F.substring(s, 13, 1) == "C", 1).otherwise(-1)).cast("short")
    strike = F.when(is_opt, (F.substring(s, 14, 8).cast("long") / 1000)).cast("int")
    return F.struct(strike.alias("Strike"), cp.alias("CP"), expiry.alias("Expiry"))


def make_option_symbol(
    root: Column | str, expiry: Column, cp: Column, strike: Column
) -> Column:
    """Inverse of :func:`parse_option_symbol` (tools/schwab.py:1179-1200)."""
    root_col = F.lit(root) if isinstance(root, str) else root
    return F.format_string(
        "%-6s%s%s%08d",
        root_col,
        F.date_format(expiry, "yyMMdd"),
        F.when(cp >= 0, "C").otherwise("P"),
        (strike * 1000).cast("long"),
    )


def generate_symbols_df(
    spark: SparkSession,
    spx: float,
    expiry,  # datetime.date
    strike_range: int = 100,
    strike_step: int = 5,
    root: str = "SPXW",
) -> DataFrame:
    """Strike universe around the underlying (SURVEY F3; tools/schwab.py:1158-1201).

    Strikes span ``[floor_to_step(spx - range), ceil_to_step(spx + range)]`` at
    ``strike_step`` spacing, each emitted as a call and a put. Built with
    ``sequence`` + ``explode`` so the universe is a distributed DataFrame, not a
    driver-side loop.
    """
    lo = F.floor(F.lit(spx - strike_range) / strike_step).cast("int") * strike_step
    hi = F.ceil(F.lit(spx + strike_range) / strike_step).cast("int") * strike_step
    return (
        spark.range(1)
        .select(F.explode(F.sequence(lo, hi, F.lit(strike_step))).alias("Strike"))
        .crossJoin(spark.range(1).select(F.explode(F.array(F.lit(1), F.lit(-1))).alias("CP")))
        .select(
            F.col("Strike"),
            F.col("CP").cast("short").alias("CP"),
            F.lit(expiry).cast("date").alias("Expiry"),
            make_option_symbol(
                root, F.lit(expiry).cast("date"), F.col("CP"), F.col("Strike")
            ).alias("symbol"),
        )
    )
