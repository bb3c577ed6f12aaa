"""Scalar function library — all native Column expressions, no Python UDFs.

The reference's entire UDF surface (SURVEY §2.10) — two SQL Server ITVFs plus
Python-side procedural transforms — is expressible as built-in Spark column
expressions, which keeps every hot path inside whole-stage codegen.
"""

from schwab_elt_etl_pipeline_spark.functions.scalars import (
    clamp,
    outlier_flag,
    round_to_step,
    signed_price,
)
from schwab_elt_etl_pipeline_spark.functions.symbols import (
    generate_symbols_df,
    make_option_symbol,
    parse_option_symbol,
)
from schwab_elt_etl_pipeline_spark.functions.timeutils import (
    epoch_ms_to_tz_naive,
    parse_multi_format_ts,
    seconds_of_day,
    time_of_day_between,
)

__all__ = [
    "clamp",
    "outlier_flag",
    "round_to_step",
    "signed_price",
    "generate_symbols_df",
    "make_option_symbol",
    "parse_option_symbol",
    "epoch_ms_to_tz_naive",
    "parse_multi_format_ts",
    "seconds_of_day",
    "time_of_day_between",
]
