"""Classic analytical queries over the benchmark star schema.

These exercise the engine's core relational path — multi-way joins with
broadcast dims, partial aggregation, deterministic top-k — the Spark
equivalents of the reference's join/agg inventory at TPC-H shape
(SURVEY §2.3/§2.4). All are headline bench queries.

Decimal discipline (see catalog/__init__.py): monetary expressions go through
exact DECIMAL arithmetic and convert to DOUBLE only at the output boundary, so
values are independent of partial-aggregation order on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.sources import load_table

_DEC = "decimal(18,4)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(_DEC)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with exact decimal sums (A3/A4).

    The charge product uses narrow decimals — (12,2)×(3,2)×(3,2) stays exact
    at scale 6; a wide three-way product overflows precision 38 and engines
    round the overflow differently.
    """
    li = load_table(spark, sf_dir, "lineitem")
    price12 = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_f = F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    tax_f = F.lit(1).cast("decimal(3,2)") + F.col("l_tax").cast("decimal(3,2)")
    disc_price = price12 * disc_f
    charge = price12 * disc_f * tax_f
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        # NOTE: no repartition before the agg — partial aggregation collapses
        # 600k rows to 4 groups pre-shuffle, so a row-spreading exchange costs
        # more than the single-task decimal math it would parallelize
        # (measured 1.8s -> 5-7s with an RR repartition here)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sq"),
            F.sum(_dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
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


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + top-k with unique tiebreaker
    (J1/J10/O2-O3). Customer dim broadcasts."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    # dimension-first reduction (same rationale as q5): BUILDING customers
    # cut orders ~5x before the fact join; the reduced orders side stays
    # broadcastable at this SF, and dropping the hint falls back to SMJ+AQE
    ord_bldg = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        li.join(F.broadcast(ord_bldg), li.l_orderkey == ord_bldg.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).alias("_rev"))
        .select(
            "o_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through two broadcast dims (region→nation)
    plus customer/orders/lineitem chain; revenue per nation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))
    dims = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    # Join order: reduce through the selective dimension chain FIRST
    # (region filter -> nations -> customers -> orders), so the fact table
    # joins one already-reduced build side instead of shuffling twice.
    # customers-of-region is a filtered dimension (|cust|/|regions|) and
    # orders-of-region is |orders|/|regions| — both broadcastable here; at
    # SFs where orders-of-region outgrows the broadcast budget, drop the
    # outer hint and AQE plans the li join as SMJ on the reduced side (the
    # dimension-first reduction itself stays correct at any scale).
    cust_region = cust.join(dims, cust.c_nationkey == dims.n_nationkey).select(
        "c_custkey", "n_name"
    )
    ord_region = orders.join(
        F.broadcast(cust_region), orders.o_custkey == cust_region.c_custkey
    ).select("o_orderkey", "n_name")
    return (
        li.join(F.broadcast(ord_region), li.l_orderkey == ord_region.o_orderkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).alias("_rev"), F.count(F.lit(1)).alias("n_items"))
        .select("n_name", F.col("_rev").cast("double").alias("revenue"), "n_items")
    )


Q5_SQL = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey   = o_orderkey
JOIN customer ON o_custkey    = c_custkey
JOIN nation   ON c_nationkey  = n_nationkey
JOIN region   ON n_regionkey  = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q6_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter scalar aggregate — the pushdown
    showcase (predicates reach the parquet reader)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_discount")).alias("_r"))
        .select(F.col("_r").cast("double").alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + grouped top-k: biggest customers by order value (J1/A3/O3)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_dec("o_totalprice")).alias("_tot"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("_tot").cast("double").alias("total_spend"),
            "n_orders",
        )
        .orderBy(F.desc("total_spend"), F.asc("c_custkey"))
        .limit(10)
    )


Q_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey ASC
LIMIT 10
"""


SPECS = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL, headline=True,
              doc="scan→filter→agg, exact decimal sums"),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL, headline=True,
              doc="3-way join + deterministic top-k"),
    QuerySpec("q5_region_revenue", q5_region_revenue, Q5_SQL, headline=True,
              doc="star join through broadcast dims"),
    QuerySpec("q6_revenue_change", q6_revenue_change, Q6_SQL, headline=True,
              doc="scan-filter scalar agg; full pushdown"),
    QuerySpec("q_top_customers", q_top_customers, Q_TOP_CUSTOMERS_SQL, headline=True,
              doc="join + grouped top-k"),
]
