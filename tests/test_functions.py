"""Unit tests for the scalar function library (SURVEY F2-F15)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.functions import (
    clamp,
    epoch_ms_to_tz_naive,
    generate_symbols_df,
    make_option_symbol,
    outlier_flag,
    parse_multi_format_ts,
    parse_option_symbol,
    round_to_step,
    seconds_of_day,
    signed_price,
    time_of_day_between,
)


def test_parse_option_symbol_roundtrip(spark):
    df = spark.createDataFrame(
        [("SPXW  260813C06000000",), ("SPXW  241231P00950500",), ("$SPX",)], ["symbol"]
    )
    out = df.select("symbol", parse_option_symbol("symbol").alias("o")).orderBy("symbol")
    rows = {r["symbol"]: r["o"] for r in out.collect()}
    assert rows["SPXW  260813C06000000"].asDict() == {
        "Strike": 6000,
        "CP": 1,
        "Expiry": dt.date(2026, 8, 13),
    }
    assert rows["SPXW  241231P00950500"].asDict() == {
        "Strike": 950,  # 950500/1000 truncated to int strike 950 (int cast)
        "CP": -1,
        "Expiry": dt.date(2024, 12, 31),
    }
    assert rows["$SPX"].asDict() == {"Strike": None, "CP": None, "Expiry": None}


def test_make_option_symbol_inverse(spark):
    df = spark.createDataFrame([(6000, 1), (950, -1)], ["Strike", "CP"])
    out = df.select(
        make_option_symbol(
            "SPXW", F.lit(dt.date(2026, 8, 13)), F.col("CP"), F.col("Strike")
        ).alias("symbol"),
        parse_option_symbol(
            make_option_symbol("SPXW", F.lit(dt.date(2026, 8, 13)), F.col("CP"), F.col("Strike"))
        ).alias("o"),
    ).collect()
    assert out[0]["symbol"] == "SPXW  260813C06000000"
    for row in out:
        assert row["o"]["Expiry"] == dt.date(2026, 8, 13)
    assert {r["o"]["Strike"] for r in out} == {6000, 950}


def test_generate_symbols_universe(spark):
    # reference config: ±100 pts, step 5 → 41 strikes × {C,P} = 82 symbols
    df = generate_symbols_df(spark, spx=6000.0, expiry=dt.date(2026, 8, 13))
    assert df.count() == 82
    strikes = sorted(r["Strike"] for r in df.select("Strike").distinct().collect())
    assert strikes[0] == 5900 and strikes[-1] == 6100 and len(strikes) == 41


def test_epoch_ms_to_tz_naive(spark):
    # 2024-06-15 17:00:00 UTC == 10:00:00 PDT
    ms = int(dt.datetime(2024, 6, 15, 17, 0, 0, tzinfo=dt.timezone.utc).timestamp() * 1000)
    row = spark.range(1).select(epoch_ms_to_tz_naive(F.lit(ms)).alias("t")).first()
    assert row["t"] == dt.datetime(2024, 6, 15, 10, 0, 0)


def test_parse_multi_format_ts(spark):
    df = spark.createDataFrame(
        [("2024-06-15T10:00:00",), ("2024-06-15 10:00:00",), ("2024-06-15",), ("06/15/2024",)],
        ["s"],
    )
    out = [r["t"] for r in df.select(parse_multi_format_ts("s").alias("t")).collect()]
    assert all(t is not None and t.date() == dt.date(2024, 6, 15) for t in out)


def test_time_of_day_between(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 6, 15, 6, 29, 59),), (dt.datetime(2024, 6, 15, 6, 30, 0),),
         (dt.datetime(2024, 6, 15, 13, 0, 0),), (dt.datetime(2024, 6, 15, 13, 0, 1),)],
        ["t"],
    )
    out = df.select("t", time_of_day_between("t", "06:30:00", "13:00:00").alias("in_sess"))
    got = {r["t"].time().isoformat(): r["in_sess"] for r in out.collect()}
    assert got == {
        "06:29:59": False,
        "06:30:00": True,
        "13:00:00": True,
        "13:00:01": False,
    }
    assert spark.range(1).select(
        seconds_of_day(F.lit("2024-06-15 06:30:00").cast("timestamp"))
    ).first()[0] == 6 * 3600 + 30 * 60


def test_clamp_round_signed(spark):
    df = spark.createDataFrame([(-1.0,), (2.5,), (7.0,)], ["x"])
    got = [r[0] for r in df.select(clamp(F.col("x"), 0.0, 5.0)).collect()]
    assert got == [0.0, 2.5, 5.0]
    assert spark.range(1).select(round_to_step(F.lit(6002.4), 5)).first()[0] == 6000.0
    assert spark.range(1).select(round_to_step(F.lit(6002.5), 5)).first()[0] == 6005.0
    df2 = spark.createDataFrame(
        [("BUY_TO_OPEN", 1.5), ("SELL_TO_CLOSE", 2.0)], ["instruction", "price"]
    )
    got2 = dict(
        (r["instruction"], r["p"])
        for r in df2.select("instruction", signed_price(F.col("instruction"), F.col("price")).alias("p")).collect()
    )
    assert got2 == {"BUY_TO_OPEN": -1.5, "SELL_TO_CLOSE": 2.0}


def test_outlier_flag(spark):
    df = spark.createDataFrame(
        [(2.0, 1.0, 1.0), (1.4, 1.0, 1.0), (0.2, 1.0, 1.0), (2.0, 1.0, None)],
        ["o", "pre", "fol"],
    )
    got = [
        r["oi"]
        for r in df.select(
            outlier_flag(F.col("o"), F.col("pre"), F.col("fol")).alias("oi")
        ).collect()
    ]
    # spike up, within threshold, spike down, null neighbor (edge → not flagged)
    assert got == [1, 0, 1, 0]
