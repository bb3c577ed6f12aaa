"""Golden tests for the OHLC promote, order-graph/transactions, and chains
pipelines (SURVEY §3.2, §3.3, honorable-mention chains path)."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.plans.chains import flatten_chains
from schwab_elt_etl_pipeline_spark.plans.ohlc import promote_ohlc
from schwab_elt_etl_pipeline_spark.plans.orders_plan import (
    build_transactions,
    flatten_child_orders,
    normalize_order_graph,
)
from schwab_elt_etl_pipeline_spark.schemas import CHAIN_DOC, OHLC_STAGE, ORDER


def test_ohlc_promote_dedup_and_antijoin(spark):
    t0 = dt.datetime(2024, 6, 17, 6, 30)
    stage_rows = [
        (5500.0, 5510.0, 5490.0, 5505.0, 1000, t0, "$SPX", "MINUTE"),
        (5500.0, 5510.0, 5490.0, 5505.0, 1000, t0, "$SPX", "MINUTE"),  # exact dup (A1)
        (5501.0, 5511.0, 5491.0, 5506.0, 1100, t0 + dt.timedelta(minutes=1), "$SPX", "MINUTE"),
        (5400.0, 5520.0, 5390.0, 5500.0, 0, dt.datetime(2024, 6, 17), "$SPX", "DAY"),
    ]
    stage = spark.createDataFrame(stage_rows, OHLC_STAGE)

    minute, day = promote_ohlc(stage)
    assert minute.count() == 2  # dup collapsed
    assert day.count() == 1
    row = minute.orderBy("Dt").first()
    assert row["O"] == Decimal("5500.00") and row["Sym"] == "$SPX"

    # anti-join: re-promoting against the just-built targets yields nothing new
    minute2, day2 = promote_ohlc(stage, historic_minute=minute, historic_day=day)
    assert minute2.count() == 0 and day2.count() == 0


def _order(order_id: str, status: str = "FILLED", strategy: str = "SINGLE",
           legs=None, acts=None, children=None):
    return {
        "orderId": order_id,
        "session": "NORMAL",
        "duration": "DAY",
        "orderType": "NET_CREDIT",
        "complexOrderStrategyType": "VERTICAL",
        "quantity": 1.0,
        "filledQuantity": 1.0,
        "remainingQuantity": 0.0,
        "requestedDestination": None,
        "destinationLinkName": None,
        "stopPrice": None,
        "stopType": None,
        "orderStrategyType": strategy,
        "cancelable": "false",
        "editable": "false",
        "status": status,
        "enteredTime": "2024-06-17T09:30:00",
        "closeTime": "2024-06-17T09:31:00",
        "tag": None,
        "accountNumber": "ACC1",
        "orderLegCollection": legs or [],
        "orderActivityCollection": acts or [],
        "childOrderStrategies": children or [],
    }


def _leg(leg_id: str, instruction: str, symbol: str, qty: float = 1.0):
    return {
        "legId": leg_id,
        "orderLegType": "OPTION",
        "instruction": instruction,
        "positionEffect": "OPENING",
        "quantity": qty,
        "instrument": {
            "assetType": "OPTION", "cusip": None, "symbol": symbol,
            "description": None, "instrumentId": None, "type": None,
            "putCall": "PUT", "underlyingSymbol": "$SPX",
        },
    }


def _act(legs):
    return {
        "activityType": "EXECUTION", "executionType": "FILL",
        "quantity": 1.0, "orderRemainingQuantity": 0.0,
        "executionLegs": legs,
    }


def _xleg(leg_id: str, price: float):
    return {
        "legId": leg_id, "quantity": 1.0, "mismarkedQuantity": 0.0,
        "price": price, "time": "2024-06-17T09:30:30", "instrumentId": None,
    }


@pytest.fixture(scope="module")
def orders_df(spark):
    docs = [
        # 2-leg vertical: SELL short leg at 2.5, BUY long leg at 1.0 → P = 1.5
        _order(
            "1001",
            legs=[
                _leg("1", "SELL_TO_OPEN", "SPXW  240621P05500000"),
                _leg("2", "BUY_TO_OPEN", "SPXW  240621P05495000"),
            ],
            acts=[_act([_xleg("1", 2.5), _xleg("2", 1.0)])],
        ),
        # OCO parent with one child — parent excluded (P7), child flattened
        _order(
            "2001",
            strategy="OCO",
            children=[
                _order(
                    "2002",
                    legs=[_leg("1", "SELL_TO_CLOSE", "SPXW  240621P05500000")],
                    acts=[_act([_xleg("1", 3.0)])],
                )
            ],
        ),
        # non-filled order — excluded by status filter
        _order("3001", status="CANCELED",
               legs=[_leg("1", "BUY_TO_OPEN", "SPXW  240621P05490000")]),
    ]
    return spark.createDataFrame(docs, ORDER)


def test_flatten_child_orders(spark, orders_df):
    flat = flatten_child_orders(orders_df)
    rows = {r["orderId"]: r["parentOrderId"] for r in flat.select("orderId", "parentOrderId").collect()}
    assert rows == {"1001": None, "2001": None, "3001": None, "2002": "2001"}


def test_order_graph_and_transactions(spark, orders_df):
    orders_tbl, legs, acts, xlegs = normalize_order_graph(orders_df)
    assert orders_tbl.count() == 4  # 3 top-level + 1 child
    assert legs.count() == 4
    assert acts.count() == 2
    assert xlegs.count() == 3

    tx = build_transactions(orders_tbl, legs, acts, xlegs)
    rows = {r["orderId"]: r for r in tx.collect()}
    # OCO parent 2001 and CANCELED 3001 excluded; 1001 + child 2002 remain
    assert set(rows) == {"1001", "2002"}
    r = rows["1001"]
    # signed prices: SELL +2.5, BUY −1.0 → leg avgs ±, outer sum = 1.5 (A4/A6)
    assert r["P"] == pytest.approx(1.5)
    assert r["SS"] == "SPXW  240621P05500000"  # short symbol (A5 pivot)
    assert r["LS"] == "SPXW  240621P05495000"
    assert r["putCall"] == "PUT" and r["PositionEffect"] == "OPENING"
    assert rows["2002"]["P"] == pytest.approx(3.0)


def test_chains_flatten(spark):
    opt = {
        "bid": 2.4, "ask": 2.6, "totalVolume": 120,
        "quoteTimeInLong": 1718640000000,  # 2024-06-17 09:00:00 PDT
        "volatility": 14.5, "delta": -0.45, "gamma": 0.002, "theta": -0.9,
        "vega": 1.2, "rho": -0.05, "openInterest": 5000,
        "optionRoot": "SPXW", "daysToExpiration": 4,
    }
    doc = {
        "callExpDateMap": {"2024-06-21:4": {"5500.0": [dict(opt, delta=0.55)]}},
        "putExpDateMap": {"2024-06-21:4": {"5500.0": [opt], "5495.0": [opt]}},
    }
    chains = spark.createDataFrame([doc], CHAIN_DOC)
    out = flatten_chains(chains)
    rows = out.collect()
    assert len(rows) == 3
    by_key = {(r["CP"], r["Strike"]): r for r in rows}
    assert set(by_key) == {(1, 5500), (-1, 5500), (-1, 5495)}
    call = by_key[(1, 5500)]
    assert call["Expiry"] == dt.date(2024, 6, 21)
    assert call["Weekly"] == 1
    assert call["Bid"] == Decimal("2.40")
    assert call["Delta"] == Decimal("0.550")
    assert call["DTime"] == dt.datetime(2024, 6, 17, 9, 0, 0)


def test_multimodal_stub_pipeline(spark):
    from schwab_elt_etl_pipeline_spark.operators.multimodal import (
        FEATURE_DIM,
        MEDIA_SCHEMA,
        decode_stub_features,
        frame_sample_plan,
    )

    rows = [
        (1, "image", "image/png", b"\x89PNG...", (640, 480, None, None)),
        (2, "video", "video/mp4", b"\x00\x00ftyp", (1920, 1080, 3500, None)),
        (3, "audio", "audio/wav", None, (None, None, 2000, 16000)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = decode_stub_features(media)
    got = {r["media_id"]: r for r in feats.collect()}
    assert set(got) == {1, 2, 3}
    assert got[3]["n_bytes"] == 0  # null payload handled
    assert len(got[1]["features"]) == FEATURE_DIM
    # determinism: same payload → same features
    feats2 = {r["media_id"]: r["features"] for r in decode_stub_features(media).collect()}
    assert feats2[1] == got[1]["features"]

    frames = frame_sample_plan(media, every_ms=1000)
    got_frames = [r["frame_at_ms"] for r in frames.orderBy("frame_at_ms").collect()]
    assert got_frames == [0, 1000, 2000, 3000]  # only the video row, 3.5s span


def test_multimodal_resize_stub(spark):
    from schwab_elt_etl_pipeline_spark.operators.multimodal import MEDIA_SCHEMA, resize_stub

    rows = [
        (1, "image", "image/png", b"x" * 1000, (100, 100, None, None)),
        (2, "image", "image/png", b"y" * 50, (4, 4, None, None)),  # upscale → no growth
        (3, "audio", "audio/wav", None, (None, None, 2000, 16000)),  # null payload
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in resize_stub(media, 10, 10).collect()}
    assert set(out) == {1, 2, 3}
    # payload shrinks in proportion to the pixel-count change: 10k→100 px = 1%
    assert len(out[1]["payload"]) == 10
    # never grows past the original
    assert len(out[2]["payload"]) == 50
    # meta struct rewritten, non-spatial fields carried through
    assert (out[1]["meta"]["width"], out[1]["meta"]["height"]) == (10, 10)
    assert out[3]["meta"]["sample_rate"] == 16000
    assert out[3]["payload"] == b""  # null payload → empty bytes, not None
    # row-for-row deterministic
    again = {r["media_id"]: r["payload"] for r in resize_stub(media, 10, 10).collect()}
    assert again == {k: v["payload"] for k, v in out.items()}
