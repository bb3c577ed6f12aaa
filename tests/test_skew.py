"""Salted aggregation / join correctness: results must equal the unsalted
plans regardless of salt distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join_skewed_left,
)


def test_salted_agg_equals_plain(spark):
    # 90% of rows share one hot key
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), F.col("id") % 7)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    salted = salted_agg(
        df,
        ["k"],
        {"_s": F.sum(F.col("v").cast("decimal(18,4)")), "_c": F.count(F.lit(1))},
        {"total": F.sum("_s").cast("double"), "n": F.sum("_c")},
    )
    plain = df.groupBy("k").agg(
        F.sum(F.col("v").cast("decimal(18,4)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_equals_plain(spark):
    left = spark.range(10_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("lv")
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(5)], "k long, rv string")
    salted = salted_join_skewed_left(left, right, on=["k"])
    plain = left.join(right, on=["k"])
    assert salted.count() == plain.count() == 10_000
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
