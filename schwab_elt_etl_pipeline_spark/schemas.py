"""Explicit StructTypes for every domain table (SURVEY §1.2, §1.5, FIXTURES.md).

Type mapping follows SURVEY §1.2: SQL Server decimal(9,2)/(9,3)/(20,2) →
DecimalType, datetime/datetime2 → TimestampNTZ (Pacific wall-clock naive,
README.md:227), smallint → ShortType, bit → BooleanType, time(0) → seconds-
since-midnight IntegerType (Spark has no TimeType).

Reference DDL citations: sql/chains.sql:12-29, sql/opt.sql:13-273.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Bronze: raw streamed ticks (FIXTURES.md §1; services/schwab_stream.py:308-340)
# Sparse union of option rows (fields 37, 38) and underlying rows (3, 35),
# discriminated by symbol ("$SPX" vs "SPXW  ..."). Field ids are kept as the
# reference's numeric names at Bronze; Silver renames them.
# ---------------------------------------------------------------------------
QUOTES_STREAM = T.StructType(
    [
        T.StructField("received_at", T.LongType()),  # ingest epoch-ms
        T.StructField("symbol", T.StringType()),
        T.StructField("37", T.DoubleType()),  # option mark
        T.StructField("38", T.LongType()),  # option quote time, epoch-ms
        T.StructField("3", T.DoubleType()),  # underlying last
        T.StructField("35", T.LongType()),  # underlying trade time, epoch-ms
    ]
)

# ---------------------------------------------------------------------------
# Silver/Gold entity tables (SURVEY §1.5; docs/sql_server.md:199-207,358-360)
# Surrogate ids are deterministic hashes of the natural key (SURVEY §4 item 2)
# hence LongType, not IDENTITY ints.
# ---------------------------------------------------------------------------
OPT = T.StructType(
    [
        T.StructField("OPT_ID", T.LongType(), False),
        T.StructField("Strike", T.IntegerType(), False),
        T.StructField("CP", T.ShortType(), False),  # +1 call / -1 put
        T.StructField("Expiry", T.DateType(), False),
    ]
)

OPTM = T.StructType(
    [
        T.StructField("OPT_ID", T.LongType(), False),
        T.StructField("T", T.TimestampNTZType(), False),
        T.StructField("O", T.DecimalType(9, 2)),
    ]
)

VERT = T.StructType(
    [
        T.StructField("VID", T.LongType(), False),
        T.StructField("SID", T.LongType(), False),  # short-leg OPT_ID
        T.StructField("LID", T.LongType(), False),  # long-leg OPT_ID
        T.StructField("SS", T.IntegerType(), False),  # short strike
        T.StructField("W", T.IntegerType(), False),  # width in strikes
        T.StructField("CP", T.ShortType(), False),
        T.StructField("Expiry", T.DateType(), False),
    ]
)

VERT_TS = T.StructType(
    [
        T.StructField("VID", T.LongType(), False),
        T.StructField("T", T.TimestampNTZType(), False),
        T.StructField("O", T.DecimalType(9, 2)),
        T.StructField("AVG_R", T.DecimalType(9, 2)),
    ]
)

# ---------------------------------------------------------------------------
# Chains snapshots (sql/chains.sql:12-29; FIXTURES.md §2)
# ---------------------------------------------------------------------------
SPX_CHAIN = T.StructType(
    [
        T.StructField("CP", T.ShortType()),
        T.StructField("Expiry", T.DateType()),
        T.StructField("DTE", T.IntegerType()),
        T.StructField("Strike", T.IntegerType()),
        T.StructField("Bid", T.DecimalType(9, 2)),
        T.StructField("Ask", T.DecimalType(9, 2)),
        T.StructField("Volume", T.IntegerType()),
        T.StructField("DTime", T.TimestampNTZType()),  # datetime2(0): sec precision
        T.StructField("Volatility", T.DecimalType(9, 2)),
        T.StructField("Delta", T.DecimalType(9, 3)),
        T.StructField("Gamma", T.DecimalType(9, 3)),
        T.StructField("Theta", T.DecimalType(9, 3)),
        T.StructField("Vega", T.DecimalType(9, 3)),
        T.StructField("Rho", T.DecimalType(9, 3)),
        T.StructField("OI", T.IntegerType()),
        T.StructField("Weekly", T.IntegerType()),
    ]
)

# ---------------------------------------------------------------------------
# Raw chain document (Bronze): expiry→strike→[option] nested maps
# (services/schwab_chains_service.py:75-107). Kept as native MapType/ArrayType
# per SURVEY §1.2; Silver explodes to SPX_CHAIN.
# ---------------------------------------------------------------------------
_CHAIN_OPTION = T.StructType(
    [
        T.StructField("bid", T.DoubleType()),
        T.StructField("ask", T.DoubleType()),
        T.StructField("totalVolume", T.LongType()),
        T.StructField("quoteTimeInLong", T.LongType()),
        T.StructField("volatility", T.DoubleType()),
        T.StructField("delta", T.DoubleType()),
        T.StructField("gamma", T.DoubleType()),
        T.StructField("theta", T.DoubleType()),
        T.StructField("vega", T.DoubleType()),
        T.StructField("rho", T.DoubleType()),
        T.StructField("openInterest", T.LongType()),
        T.StructField("optionRoot", T.StringType()),
        T.StructField("daysToExpiration", T.LongType()),
    ]
)

_EXP_DATE_MAP = T.MapType(T.StringType(), T.MapType(T.StringType(), T.ArrayType(_CHAIN_OPTION)))

CHAIN_DOC = T.StructType(
    [
        T.StructField("callExpDateMap", _EXP_DATE_MAP),
        T.StructField("putExpDateMap", _EXP_DATE_MAP),
    ]
)

# ---------------------------------------------------------------------------
# OHLC staging + historic (sql/opt.sql:13-38,44-56,83-94; FIXTURES.md §3)
# ---------------------------------------------------------------------------
OHLC_STAGE = T.StructType(
    [
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("datetime", T.TimestampNTZType()),
        T.StructField("Symbol", T.StringType()),
        T.StructField("freq", T.StringType()),  # 'MINUTE' | 'DAY'
    ]
)

HISTORIC_MINUTE = T.StructType(
    [
        T.StructField("O", T.DecimalType(9, 2)),
        T.StructField("H", T.DecimalType(9, 2)),
        T.StructField("L", T.DecimalType(9, 2)),
        T.StructField("C", T.DecimalType(9, 2)),
        T.StructField("V", T.LongType()),
        T.StructField("Dt", T.TimestampNTZType()),
        T.StructField("Sym", T.StringType()),
    ]
)

HISTORIC_DAY = T.StructType(
    [
        T.StructField("O", T.DecimalType(9, 2)),
        T.StructField("H", T.DecimalType(9, 2)),
        T.StructField("L", T.DecimalType(9, 2)),
        T.StructField("C", T.DecimalType(9, 2)),
        T.StructField("Dt", T.DateType()),
        T.StructField("Sym", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Order graph (sql/opt.sql:62-170; FIXTURES.md §4). Bronze keeps the nested
# document; Silver explodes to the four flat tables.
# ---------------------------------------------------------------------------
_INSTRUMENT = T.StructType(
    [
        T.StructField("assetType", T.StringType()),
        T.StructField("cusip", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("instrumentId", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("putCall", T.StringType()),
        T.StructField("underlyingSymbol", T.StringType()),
    ]
)

ORDER_LEG = T.StructType(
    [
        T.StructField("legId", T.StringType()),
        T.StructField("orderLegType", T.StringType()),
        T.StructField("instruction", T.StringType()),
        T.StructField("positionEffect", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("instrument", _INSTRUMENT),
    ]
)

EXECUTION_LEG = T.StructType(
    [
        T.StructField("legId", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("mismarkedQuantity", T.DoubleType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("time", T.StringType()),  # ISO8601
        T.StructField("instrumentId", T.StringType()),
    ]
)

ORDER_ACTIVITY = T.StructType(
    [
        T.StructField("activityType", T.StringType()),
        T.StructField("executionType", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("orderRemainingQuantity", T.DoubleType()),
        T.StructField("executionLegs", T.ArrayType(EXECUTION_LEG)),
    ]
)


def _order_fields() -> list[T.StructField]:
    return [
        T.StructField("orderId", T.StringType()),
        T.StructField("session", T.StringType()),
        T.StructField("duration", T.StringType()),
        T.StructField("orderType", T.StringType()),
        T.StructField("complexOrderStrategyType", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("filledQuantity", T.DoubleType()),
        T.StructField("remainingQuantity", T.DoubleType()),
        T.StructField("requestedDestination", T.StringType()),
        T.StructField("destinationLinkName", T.StringType()),
        T.StructField("stopPrice", T.DoubleType()),
        T.StructField("stopType", T.StringType()),
        T.StructField("orderStrategyType", T.StringType()),
        T.StructField("cancelable", T.StringType()),
        T.StructField("editable", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("enteredTime", T.StringType()),
        T.StructField("closeTime", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("accountNumber", T.StringType()),
        T.StructField("orderLegCollection", T.ArrayType(ORDER_LEG)),
        T.StructField("orderActivityCollection", T.ArrayType(ORDER_ACTIVITY)),
    ]


def order_schema(child_depth: int = 3) -> T.StructType:
    """Nested order document; ``childOrderStrategies`` recursion unrolled to a
    bounded depth (tools/db.py:1077-1080 recurses; depth ≤ 3 per FIXTURES §4)."""
    fields = _order_fields()
    if child_depth > 0:
        fields.append(
            T.StructField("childOrderStrategies", T.ArrayType(order_schema(child_depth - 1)))
        )
    return T.StructType(fields)


ORDER = order_schema()

TRANSACTIONS = T.StructType(
    [
        T.StructField("orderType", T.StringType()),
        T.StructField("V", T.StringType()),  # complexOrderStrategyType
        T.StructField("orderId", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("enteredTime", T.TimestampNTZType()),
        T.StructField("closeTime", T.TimestampNTZType()),
        T.StructField("accountNumber", T.StringType()),
        T.StructField("AQ", T.DoubleType()),  # aggregate quantity
        T.StructField("P", T.DoubleType()),  # signed net price
        T.StructField("SS", T.StringType()),  # short symbol
        T.StructField("LS", T.StringType()),  # long symbol
        T.StructField("putCall", T.StringType()),
        T.StructField("PositionEffect", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Operational tables (sql/opt.sql:215-231,264-273; FIXTURES.md §5-6)
# ---------------------------------------------------------------------------
MARKET_HOURS = T.StructType(
    [
        T.StructField("ProcTime", T.TimestampNTZType()),
        T.StructField("market_date", T.DateType(), False),
        T.StructField("market_type", T.StringType()),
        T.StructField("session_start", T.StringType()),  # 'HH:mm:ss'
        T.StructField("session_end", T.StringType()),
        T.StructField("is_open", T.BooleanType()),
    ]
)

BALANCES = T.StructType(
    [
        T.StructField("ApiCallTime", T.TimestampNTZType(), False),
        T.StructField("accountId", T.IntegerType(), False),
        T.StructField("roundTrips", T.ShortType()),
        T.StructField("isDayTrader", T.ShortType()),
        T.StructField("isClosingOnly", T.ShortType()),
        T.StructField("buyingPower", T.DecimalType(20, 2)),
        T.StructField("cashBalance", T.DecimalType(20, 2)),
        T.StructField("liquidationValue", T.DecimalType(20, 2)),
    ]
)
