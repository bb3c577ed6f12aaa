"""Round-5 scale-technique wave: explicit shuffle-reduction patterns,
value-verified against plain-plan oracles.

Both queries here exist to pin the TECHNIQUE, not a new answer: the oracle
states the naive plan (plain semi-join / plain join) and a hash match
proves the optimized physical strategy — bloom prefilter, salted
replication — changes nothing but the data movement. This is the same
verification idea as ``a_salted_hot_keys`` (salted aggregation verified by
value) extended to joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.bloom import bloom_member, build_bloom
from schwab_elt_etl_pipeline_spark.operators.skew import salted_join_skewed_left
from schwab_elt_etl_pipeline_spark.sources import load_table

def j_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: lineitem rows of URGENT orders.

    The build side folds urgent order keys into a 2 KiB bit array
    (``operators/bloom.py``: 3 xxhash64 probes over 16384 bits), broadcast
    as ONE row; the probe side tests membership with pure bit arithmetic
    BEFORE the exact left-semi join confirms candidates (bloom false
    positives die there; false negatives cannot happen — asserted directly
    in tests/test_skew.py). At 100 TB this is the classic shuffle-reduction
    move: the 2 KiB filter eliminates ~(1-selectivity) of the probe side's
    shuffle volume ahead of the join — what Spark's runtime row-group bloom
    does inside the scan, made explicit and composable. The oracle is the
    PLAIN semi-join: the hash match proves the prefilter is invisible to
    the result.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("key")
    )
    bloom = build_bloom(urgent, "key")
    candidates = (
        li.crossJoin(F.broadcast(bloom))
        .filter(bloom_member(F.col("l_orderkey"), F.col("arr")))
        .drop("arr")
    )
    confirmed = candidates.join(
        urgent.withColumnRenamed("key", "l_orderkey"), "l_orderkey", "left_semi"
    )
    return confirmed.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
    )


BLOOM_SEMI_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
GROUP BY l_returnflag, l_linestatus
"""


def j_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replicated-right salted join under manufactured skew, verified by
    value against the plain join.

    The left side folds every event onto THREE hot keys (user_id % 3) — the
    worst-case shuffle skew: a plain repartition join sends a third of the
    table to one reducer. ``salted_join_skewed_left`` spreads each hot key
    over 16 salts and replicates the (tiny but non-broadcast-shaped) right
    side across them; the salt column cancels in the final aggregate, which
    the oracle's plain-join formulation proves. This is the explicit rescue
    for skew AQE cannot split (e.g. when the hot key is known up front and
    the join must stay shuffle-shaped for a later co-partitioned stage).
    """
    ev = load_table(spark, sf_dir, "events")
    left = ev.select(
        (F.col("user_id") % 3).alias("hot_key"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    orders = load_table(spark, sf_dir, "orders")
    dim = orders.groupBy((F.col("o_custkey") % 3).alias("hot_key")).agg(
        F.count(F.lit(1)).alias("dim_orders")
    )
    joined = salted_join_skewed_left(left, dim, on=["hot_key"], salt_buckets=16)
    return joined.groupBy("hot_key", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("total_value"),
        F.max("dim_orders").alias("dim_orders"),
    )


SALTED_JOIN_SQL = """
WITH left_side AS (
  SELECT user_id % 3 AS hot_key, event_type,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
), dim AS (
  SELECT o_custkey % 3 AS hot_key, COUNT(*) AS dim_orders
  FROM orders GROUP BY o_custkey % 3
)
SELECT l.hot_key, l.event_type, COUNT(*) AS n,
       CAST(SUM(v) AS DOUBLE) AS total_value,
       MAX(dim_orders) AS dim_orders
FROM left_side l JOIN dim USING (hot_key)
GROUP BY l.hot_key, l.event_type
"""


def f21_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4): parse the
    JSON props payload once into the binary variant encoding, then extract
    typed paths with ``variant_get`` — the open-schema path for payloads
    whose shape drifts (vs ``from_json``, which needs the schema up front;
    the drifting-schema Bronze conformance query covers that side).

    At scale variant beats re-parsing JSON text per access: the parse
    happens once per row, extraction is a binary-encoded path lookup, and
    shredding keeps it columnar. Aggregates per extracted item id: count +
    exact-decimal mean of the metric.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    typed = ev.select(
        F.variant_get(v, "$.k", "int").alias("item"),
        F.col("value").cast("decimal(18,6)").alias("val"),
    )
    return typed.groupBy("item").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("val").cast("double") / F.count(F.lit(1))).alias("avg_value"),
    )


F21_VARIANT_SQL = """
SELECT CAST(props->>'$.k' AS INT) AS item, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
FROM events GROUP BY CAST(props->>'$.k' AS INT)
"""


SPECS = [
    QuerySpec(
        "j_bloom_semi_join", j_bloom_semi_join, BLOOM_SEMI_SQL,
        doc="bloom-prefiltered semi-join, value-verified vs the plain plan",
    ),
    QuerySpec(
        "j_salted_hot_join", j_salted_hot_join, SALTED_JOIN_SQL,
        doc="replicated-right salted join under 3-hot-key skew, by value",
    ),
    QuerySpec(
        "f21_variant_extract", f21_variant_extract, F21_VARIANT_SQL,
        doc="VARIANT-typed semi-structured extraction (parse once, typed paths)",
    ),
]
