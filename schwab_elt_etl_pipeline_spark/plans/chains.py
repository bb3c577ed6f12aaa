"""Option-chain snapshots: nested API document → SPX_CHAIN rows (SURVEY F17,
§3 honorable-mention path).

The reference walks ``callExpDateMap``/``putExpDateMap`` —
map<"expiry:dte", map<strike, [option]>> — in Python and inserts row-at-a-time
(services/schwab_chains_service.py:59-127). Here the maps explode as native
operators: two symmetric branches (call CP=+1, put CP=-1) unioned (§2.7), a
double map-explosion + array-explosion, and set-based append — the
row-at-a-time insert becomes one distributed write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.functions.timeutils import epoch_ms_to_tz_naive

#: option leaf struct inside the chain document
_OPTION_FIELDS = (
    "bid",
    "ask",
    "totalVolume",
    "quoteTimeInLong",
    "volatility",
    "delta",
    "gamma",
    "theta",
    "vega",
    "rho",
    "openInterest",
    "optionRoot",
    "daysToExpiration",
)


def _explode_side(chains: DataFrame, map_col: str, cp: int) -> DataFrame:
    """One side (calls or puts): explode expiry map → strike map → option list
    (services/schwab_chains_service.py:75-96)."""
    return (
        chains.select(F.explode(map_col).alias("exp_key", "strikes"))
        .select(
            # exp_date key is "yyyy-MM-dd:DTE" → split (F17, :76)
            F.split(F.col("exp_key"), ":")[0].cast("date").alias("Expiry"),
            F.explode("strikes").alias("strike_key", "options"),
        )
        .select(
            "Expiry",
            F.col("strike_key").cast("double").cast("int").alias("Strike"),  # :95
            F.explode("options").alias("o"),
        )
        .select(
            F.lit(cp).cast("short").alias("CP"),
            "Expiry",
            F.col("o.daysToExpiration").cast("int").alias("DTE"),
            "Strike",
            F.col("o.bid").cast("decimal(9,2)").alias("Bid"),
            F.col("o.ask").cast("decimal(9,2)").alias("Ask"),
            F.col("o.totalVolume").cast("int").alias("Volume"),
            # epoch-ms quote time → Pacific wall-clock, second precision (:81-87)
            F.date_trunc("second", epoch_ms_to_tz_naive(F.col("o.quoteTimeInLong")))
            .cast("timestamp_ntz")
            .alias("DTime"),
            F.col("o.volatility").cast("decimal(9,2)").alias("Volatility"),
            F.col("o.delta").cast("decimal(9,3)").alias("Delta"),
            F.col("o.gamma").cast("decimal(9,3)").alias("Gamma"),
            F.col("o.theta").cast("decimal(9,3)").alias("Theta"),
            F.col("o.vega").cast("decimal(9,3)").alias("Vega"),
            F.col("o.rho").cast("decimal(9,3)").alias("Rho"),
            F.col("o.openInterest").cast("int").alias("OI"),
            # weekly flag iff optionRoot == 'SPXW' (:89)
            F.when(F.col("o.optionRoot") == "SPXW", 1).otherwise(0).alias("Weekly"),
        )
    )


def flatten_chains(chains: DataFrame) -> DataFrame:
    """Full snapshot: calls (CP=+1) ∪ puts (CP=-1), SPX_CHAIN-shaped
    (sql/chains.sql:12-29)."""
    calls = _explode_side(chains, "callExpDateMap", 1)
    puts = _explode_side(chains, "putExpDateMap", -1)
    return calls.unionByName(puts)
