"""REST JSON batch sources (SURVEY S4).

The reference fetches market-data JSON driver-side and shapes it in pandas
(tools/schwab.py:870-934,956-1017,1024-1083,1086-1155). The engine keeps the
fetch driver-side (an HTTP call is not data-plane work) but moves ALL shaping
into Spark: raw JSON strings become typed nested rows via ``from_json`` with
the explicit schemas from :mod:`schemas`, then the existing plans take over
(candles → ohlc.promote_ohlc, orders → orders_plan, chains → plans.chains).

At scale the payload strings land first in a Bronze audit table (the
reference keeps raw JSON verbatim, tools/db.py:741), so shaping is replayable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from schwab_elt_etl_pipeline_spark import schemas

#: candle payload: {"candles": [{open, high, low, close, volume, datetime}] ,
#: "symbol": "...", "empty": false}  (tools/schwab.py:870-934)
CANDLES_PAYLOAD = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("empty", T.BooleanType()),
        T.StructField(
            "candles",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("open", T.DoubleType()),
                        T.StructField("high", T.DoubleType()),
                        T.StructField("low", T.DoubleType()),
                        T.StructField("close", T.DoubleType()),
                        T.StructField("volume", T.LongType()),
                        T.StructField("datetime", T.LongType()),  # epoch-ms
                    ]
                )
            ),
        ),
    ]
)


def _raw_df(spark: SparkSession, payloads: Sequence[str]) -> DataFrame:
    return spark.createDataFrame([(p,) for p in payloads], "json STRING")


def candles_to_ohlc_stage(
    spark: SparkSession, payloads: Sequence[str], freq: str
) -> DataFrame:
    """Candle payload JSON → OHLC_STAGE rows (epoch-ms → Pacific wall-clock,
    tools/schwab.py:956-973,998-1017)."""
    from schwab_elt_etl_pipeline_spark.functions.timeutils import epoch_ms_to_tz_naive

    parsed = _raw_df(spark, payloads).select(
        F.from_json("json", CANDLES_PAYLOAD).alias("p")
    )
    return (
        parsed.filter(~F.coalesce(F.col("p.empty"), F.lit(False)))
        .select(F.col("p.symbol").alias("Symbol"), F.explode("p.candles").alias("c"))
        .select(
            F.col("c.open").alias("open"),
            F.col("c.high").alias("high"),
            F.col("c.low").alias("low"),
            F.col("c.close").alias("close"),
            F.col("c.volume").alias("volume"),
            epoch_ms_to_tz_naive(F.col("c.datetime")).alias("datetime"),
            "Symbol",
            F.lit(freq).alias("freq"),
        )
    )


def orders_json_to_df(spark: SparkSession, payloads: Sequence[str]) -> DataFrame:
    """Order document JSON → nested ORDER rows (tools/db.py:707-1084 input).

    Rows without an ``orderId`` are dropped: PERMISSIVE ``from_json`` turns
    unparseable payloads into all-null structs (not NULL structs), and an
    order without its primary key is garbage either way.
    """
    return (
        _raw_df(spark, payloads)
        .select(F.from_json("json", schemas.ORDER).alias("o"))
        .filter(F.col("o.orderId").isNotNull())
        .select("o.*")
    )


def chains_json_to_df(spark: SparkSession, payloads: Sequence[str]) -> DataFrame:
    """Chain snapshot JSON → CHAIN_DOC rows (expiry→strike→[option] maps,
    services/schwab_chains_service.py:75-107 input)."""
    return (
        _raw_df(spark, payloads)
        .select(F.from_json("json", schemas.CHAIN_DOC).alias("c"))
        .select("c.*")
    )
