"""Co-located (bucketed) joins: the write-once-shuffle-never-again layout.

Pins two facts: a join of two tables bucketed on the join key plans with
ZERO exchanges even with broadcast disabled (the 100 TB amortization: the
shuffle was paid at write time), and the exchange-free plan returns exactly
the plain shuffle join's rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.bucketed import (
    bucket_spec,
    cobucketed,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    save_bucketed(li, "bkt_lineitem", buckets=8, keys=["l_orderkey"])
    save_bucketed(orders, "bkt_orders", buckets=8, keys=["l_orderkey"])
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucket_spec_roundtrip(spark, bucketed_tables):
    left, right = bucketed_tables
    assert bucket_spec(spark, left) == (8, ["l_orderkey"])
    assert cobucketed(spark, left, right, ["l_orderkey"])
    assert not cobucketed(spark, left, right, ["l_extendedprice"])


def test_cobucketed_join_is_exchange_free(spark, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path: broadcast would hide the exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(left).join(spark.table(right), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_equals_plain(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    bucketed = (
        spark.table(left)
        .join(spark.table(right), "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("rev"),
        )
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("rev"),
        )
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_aggregation_is_exchange_free(spark, bucketed_tables):
    """groupBy on the bucket key also skips its exchange — bucketing serves
    aggregations, not just joins."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_cobucketed_divisible_counts_require_coalescing_conf(spark, sf_dir):
    """Regression: divisible bucket counts only co-locate when
    coalesceBucketsInJoin is ON (default OFF plans an Exchange) — the
    helper must not certify what the planner will shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    save_bucketed(li, "bkt_fine", buckets=8, keys=["l_orderkey"])
    save_bucketed(li, "bkt_coarse", buckets=4, keys=["l_orderkey"])
    try:
        assert not cobucketed(spark, "bkt_fine", "bkt_coarse", ["l_orderkey"])
        spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
        assert cobucketed(spark, "bkt_fine", "bkt_coarse", ["l_orderkey"])
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bkt_fine").join(
                spark.table("bkt_coarse"), "l_orderkey"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan  # coalescing really does co-locate
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.conf.set(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
        )
        spark.sql("DROP TABLE IF EXISTS bkt_fine")
        spark.sql("DROP TABLE IF EXISTS bkt_coarse")
