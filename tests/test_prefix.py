"""Unit tests for the distributed prefix scan (operators/prefix.py).

The reference implements running totals with T-SQL's single-stream
``SUM() OVER (ORDER BY ...)`` (docs/sql_server.md running-total idioms);
the engine's two-phase scan must match that semantics exactly while keeping
the data out of a SinglePartition exchange. The skew case matters most: the
per-partition offsets are only correct if both evaluations of the range
exchange agree on boundaries, so we hammer the sampler with a pathological
key distribution and verify values row-for-row against a single-partition
window reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.operators.prefix import prefix_agg


def _reference(df, order, value, how, inclusive):
    hi = 0 if inclusive else -1
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, hi)
    agg = {"sum": F.sum, "max": F.max, "min": F.min}[how]
    return df.withColumn("ref", agg(value).over(w))


@pytest.mark.parametrize("how,inclusive", [("sum", True), ("sum", False), ("max", False), ("min", True)])
def test_matches_single_partition_window(spark, how, inclusive):
    rows = [(i * 37 % 4001, (i * 13 % 29) - 7) for i in range(4001)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = prefix_agg(df, ["k"], "v", "run", how=how, inclusive=inclusive, num_partitions=8)
    ref = _reference(df, "k", "v", how, inclusive)
    joined = got.join(ref.select("k", "ref"), "k")
    bad = joined.filter(~(F.col("run").eqNullSafe(F.col("ref")))).count()
    assert bad == 0


def test_skewed_keys_sampler_determinism(spark):
    """99% of keys in a narrow band hammers RangePartitioner's reservoir
    sample; the offsets must still line up with the data's partition ids.
    (AQE coalescing cannot occur here: prefix_agg passes an explicit
    numPartitions, a REPARTITION_BY_NUM shuffle origin AQE never coalesces —
    the checkpoint-shared exchange is what keeps both branches aligned.)"""
    rows = [(1000 + (i % 17), i % 11, i) for i in range(6000)]
    rows += [(i, 1, 100000 + i) for i in range(60)]  # sparse far tail
    df = spark.createDataFrame(rows, "k long, v long, tb long")
    got = prefix_agg(df, ["k", "tb"], "v", "run", how="sum", total_out="grand", num_partitions=16)
    ref = _reference(df, [F.col("k"), F.col("tb")], "v", "sum", True)
    joined = got.join(ref.select("k", "tb", "ref"), ["k", "tb"])
    assert joined.filter(F.col("run") != F.col("ref")).count() == 0
    grand = got.select("grand").distinct().collect()
    assert len(grand) == 1 and grand[0][0] == sum(r[1] for r in rows)


def test_null_values_are_transparent(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, 2)], "k long, v long"
    )
    out = {r["k"]: r["run"] for r in prefix_agg(df, ["k"], "v", "run").collect()}
    assert out == {1: None, 2: 5, 3: 5, 4: 7}
    ex = {r["k"]: r["prior"] for r in
          prefix_agg(df, ["k"], "v", "prior", inclusive=False).collect()}
    assert ex == {1: None, 2: None, 3: 5, 4: 5}


def test_plan_keeps_data_out_of_single_partition(spark):
    """The ONLY SinglePartition exchange feeds the ≤n_part-row offsets window;
    the data path is range-partitioned and broadcast-joined."""
    df = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = prefix_agg(df, ["k"], "v", "run", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The range exchange is materialized ONCE behind the shared localCheckpoint
    # — downstream it appears as a Scan ExistingRDD feeding both branches.
    assert "Scan ExistingRDD" in plan
    assert plan.count("SinglePartition") == 1
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rejects_unknown_agg(spark):
    df = spark.range(3).select(F.col("id").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        prefix_agg(df, ["k"], "v", "x", how="avg")
