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


class TestDstTransitions:
    """SURVEY §7.3.4: Pacific wall-clock conversion across DST boundaries.
    US 2024 transitions: spring-forward 2024-03-10 02:00 PST→03:00 PDT
    (10:00 UTC), fall-back 2024-11-03 02:00 PDT→01:00 PST (09:00 UTC)."""

    def _convert(self, spark, ms_list):
        from schwab_elt_etl_pipeline_spark.functions.timeutils import epoch_ms_to_tz_naive

        df = spark.createDataFrame([(m,) for m in ms_list], "ms long")
        return [
            r["t"].strftime("%Y-%m-%d %H:%M:%S")
            for r in df.select(epoch_ms_to_tz_naive("ms").alias("t")).collect()
        ]

    def test_spring_forward_skips_an_hour(self, spark):
        # 09:59:59 UTC is 01:59:59 PST; 10:00:01 UTC is 03:00:01 PDT —
        # wall-clock 02:xx does not exist on 2024-03-10
        base = 1710064800000  # 2024-03-10 10:00:00 UTC
        got = self._convert(spark, [base - 1000, base + 1000])
        assert got == ["2024-03-10 01:59:59", "2024-03-10 03:00:01"]

    def test_fall_back_repeats_an_hour(self, spark):
        # 08:30 UTC -> 01:30 PDT; 09:30 UTC -> 01:30 PST: two epochs, one
        # wall-clock timestamp (the reference's tz-naive storage semantics)
        base = 1730624400000  # 2024-11-03 09:00:00 UTC
        got = self._convert(spark, [base - 1800000, base + 1800000])
        assert got == ["2024-11-03 01:30:00", "2024-11-03 01:30:00"]

    def test_silver_collapses_fall_back_ambiguity_by_max(self, spark):
        """Two ticks an epoch-hour apart that map to the SAME wall-clock T
        must collapse via A7 MAX(mark) — the defined dedup-on-collision
        semantic — not produce duplicate (OPT_ID, T) rows."""
        from schwab_elt_etl_pipeline_spark.plans import silver
        from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM

        sym = "SPXW  241108C05500000"
        base = 1730624400000  # 2024-11-03 09:00:00 UTC (fall-back instant)
        rows = [
            (base - 1800000, sym, 10.0, base - 1800000, None, None),  # 01:30 PDT
            (base + 1800000, sym, 12.0, base + 1800000, None, None),  # 01:30 PST
        ]
        quotes = spark.createDataFrame(rows, QUOTES_STREAM)
        parsed = silver.parse_quotes(quotes)
        assert parsed.select("T").distinct().count() == 1
        _opt, optm = silver.run_silver(quotes)
        # 01:30 is outside the 06:30-13:00 session window -> OPTM drops both
        assert optm.count() == 0
        # widen the session to cover the ambiguous hour: exactly one row, MAX
        inc = silver.build_optm_increment(
            parsed, silver.build_opt(parsed), session_start="00:00:00"
        )
        out = inc.collect()
        assert len(out) == 1 and float(out[0]["O"]) == 12.0
