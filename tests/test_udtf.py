"""Python UDTF surface: lateral parse parity with the native expression, and
variable-arity strike-ladder expansion parity with generate_symbols_df."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.functions.symbols import (
    generate_symbols_df,
    parse_option_symbol,
)
from schwab_elt_etl_pipeline_spark.functions.udtf import register_udtfs

SYMS = [
    ("SPXW  240621C05500000",),
    ("SPXW  240621P05495000",),
    ("$SPX",),  # non-option: ITVF contract = no row
    ("BADLEN",),
    (None,),
]


def test_lateral_parse_matches_native(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(SYMS, "symbol STRING")
    df.createOrReplaceTempView("syms")
    lateral = spark.sql(
        "SELECT s.symbol, p.Strike, p.CP, p.Expiry "
        "FROM syms s, LATERAL parse_option_symbol(s.symbol) p"
    ).collect()
    # only the two real option symbols survive (empty table = dropped row)
    assert len(lateral) == 2
    native = {
        r["symbol"]: r["p"]
        for r in df.select("symbol", parse_option_symbol("symbol").alias("p")).collect()
    }
    for row in lateral:
        n = native[row["symbol"]]
        assert (row["Strike"], row["CP"], row["Expiry"]) == (
            n["Strike"],
            n["CP"],
            n["Expiry"],
        )


def test_strike_ladder_matches_generator(spark):
    register_udtfs(spark)
    marks = spark.createDataFrame(
        [(5500.0,)], "spx DOUBLE"
    )
    marks.createOrReplaceTempView("marks")
    ladder = spark.sql(
        "SELECT l.Strike, l.CP, l.symbol FROM marks m, "
        "LATERAL expand_strike_ladder(m.spx, 100, 5, '240621', 'SPXW') l"
    )
    expected = generate_symbols_df(
        spark, spx=5500.0, expiry=dt.date(2024, 6, 21), strike_range=100, strike_step=5
    ).select("Strike", "CP", "symbol")
    got = {tuple(r) for r in ladder.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(got) == 2 * (200 // 5 + 1)


def test_ladder_empty_on_bad_step(spark):
    register_udtfs(spark)
    one = spark.createDataFrame([(5500.0,)], "spx DOUBLE")
    one.createOrReplaceTempView("one_mark")
    out = spark.sql(
        "SELECT * FROM one_mark, LATERAL expand_strike_ladder(spx, 100, 0, '240621', 'SPXW')"
    )
    assert out.count() == 0
