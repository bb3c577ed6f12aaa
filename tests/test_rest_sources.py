"""REST JSON source shaping → existing plans, end-to-end (SURVEY S4)."""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

from schwab_elt_etl_pipeline_spark.plans.chains import flatten_chains
from schwab_elt_etl_pipeline_spark.plans.ohlc import promote_ohlc
from schwab_elt_etl_pipeline_spark.plans.orders_plan import (
    build_transactions,
    normalize_order_graph,
)
from schwab_elt_etl_pipeline_spark.sources.rest import (
    candles_to_ohlc_stage,
    chains_json_to_df,
    orders_json_to_df,
)


def test_candles_payload_to_historic(spark):
    ms = int(dt.datetime(2024, 6, 17, 13, 31, tzinfo=dt.timezone.utc).timestamp() * 1000)
    payload = json.dumps(
        {
            "symbol": "$SPX",
            "empty": False,
            "candles": [
                {"open": 5500.0, "high": 5510.0, "low": 5490.0, "close": 5505.0,
                 "volume": 1000, "datetime": ms},
                {"open": 5505.0, "high": 5515.0, "low": 5500.0, "close": 5512.0,
                 "volume": 900, "datetime": ms + 60_000},
            ],
        }
    )
    empty_payload = json.dumps({"symbol": "$VIX", "empty": True, "candles": []})
    stage = candles_to_ohlc_stage(spark, [payload, empty_payload], freq="MINUTE")
    assert stage.count() == 2  # empty payload dropped
    row = stage.orderBy("datetime").first()
    assert row["Symbol"] == "$SPX" and row["freq"] == "MINUTE"
    assert row["datetime"] == dt.datetime(2024, 6, 17, 6, 31)  # PDT wall-clock

    minute, day = promote_ohlc(stage)
    assert minute.count() == 2 and day.count() == 0
    assert minute.orderBy("Dt").first()["O"] == Decimal("5500.00")


def test_order_json_to_transactions(spark):
    payload = json.dumps(
        {
            "orderId": "42",
            "orderStrategyType": "SINGLE",
            "status": "FILLED",
            "orderType": "LIMIT",
            "complexOrderStrategyType": "NONE",
            "enteredTime": "2024-06-17T09:30:00",
            "accountNumber": "A1",
            "orderLegCollection": [
                {"legId": "1", "instruction": "SELL_TO_OPEN", "positionEffect": "OPENING",
                 "quantity": 1.0,
                 "instrument": {"symbol": "SPXW  240621P05500000", "putCall": "PUT"}},
            ],
            "orderActivityCollection": [
                {"activityType": "EXECUTION", "executionType": "FILL", "quantity": 1.0,
                 "orderRemainingQuantity": 0.0,
                 "executionLegs": [{"legId": "1", "quantity": 1.0, "price": 2.5,
                                    "time": "2024-06-17T09:30:30"}]},
            ],
        }
    )
    orders = orders_json_to_df(spark, [payload])
    tx = build_transactions(*normalize_order_graph(orders))
    row = tx.first()
    assert row["orderId"] == "42" and row["P"] == 2.5 and row["SS"] == "SPXW  240621P05500000"


def test_chains_json_to_rows(spark):
    payload = json.dumps(
        {
            "callExpDateMap": {
                "2024-06-21:4": {
                    "5500.0": [{"bid": 2.4, "ask": 2.6, "totalVolume": 10,
                                "quoteTimeInLong": 1718640000000, "volatility": 12.0,
                                "delta": 0.5, "gamma": 0.01, "theta": -0.5, "vega": 0.8,
                                "rho": 0.02, "openInterest": 99, "optionRoot": "SPXW",
                                "daysToExpiration": 4}]
                }
            },
            "putExpDateMap": {},
        }
    )
    rows = flatten_chains(chains_json_to_df(spark, [payload])).collect()
    assert len(rows) == 1
    assert rows[0]["CP"] == 1 and rows[0]["Strike"] == 5500 and rows[0]["Weekly"] == 1
