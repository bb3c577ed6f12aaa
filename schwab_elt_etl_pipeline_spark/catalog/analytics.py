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


def _cents(c: str) -> F.Column:
    """Exact integer money units for a 2-decimal monetary DOUBLE column.

    ``round(x * 100)`` reconstructs the same integer the decimal cast
    ``CAST(x AS DECIMAL(p,2)) * 100`` produces for every stored value (the
    doubles are parquet-encoded 2-decimal amounts, so x*100 lands within
    ~1e-11 of an integer — pinned exhaustively over every row of every SF in
    tests/test_decimal_longsum.py). Lets the hot aggregation path run as
    whole-stage-codegen'd LONG sums instead of BigDecimal-backed
    decimal(28+,·) sums, with the decimal conversion deferred to the tiny
    per-partition merge (see q1) — same exact values, same final doubles.
    """
    return F.round(F.col(c) * 100).cast("long")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with exact decimal sums (A3/A4).

    The charge product uses narrow decimals — (12,2)×(3,2)×(3,2) stays exact
    at scale 6; a wide three-way product overflows precision 38 and engines
    round the overflow differently.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # r13: the hot aggregation runs over exact integer-scaled LONGs (cents,
    # quantity*1e4, discount/tax hundredths) instead of decimal values —
    # BigDecimal-backed decimal(28,4)/(30,6) sum buffers dominated the stage.
    # Decimals enter only at the per-partition merge: the first aggregate
    # sums longs per (group, input partition), the second sums the few
    # partial rows as decimals — the identical exact integers, so the same
    # decimal totals and the same output doubles (value-equality pinned over
    # every SF by tests/test_decimal_longsum.py; guide §1.2 per-task work).
    # Overflow bound: |cents*f2*t2| <= 1.1e7*100*108 ~ 1.2e11 per row, so a
    # partition stays inside int64 up to ~7.6e7 rows — a 128 MB-1 GB
    # partition holds ~1e7 lineitem rows, >=7x margin at any cluster scale.
    cents = _cents("l_extendedprice")
    q4 = F.round(F.col("l_quantity") * 10000).cast("long")
    f2 = F.lit(100) - _cents("l_discount")
    t2 = F.lit(100) + _cents("l_tax")
    part = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        # NOTE: no repartition before the agg — partial aggregation collapses
        # 600k rows to 4 groups pre-shuffle, so a row-spreading exchange costs
        # more than the single-task math it would parallelize
        # (measured 1.8s -> 5-7s with an RR repartition here)
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            F.sum(q4).alias("_pq"),
            F.sum(cents).alias("_pbp"),
            F.sum(cents * f2).alias("_pdp"),
            F.sum(cents * f2 * t2).alias("_pc"),
            F.count(F.lit(1)).alias("_pn"),
        )
    )
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("_pq").cast("decimal(28,0)")).alias("_sq"),
            F.sum(F.col("_pbp").cast("decimal(28,0)")).alias("_sbp"),
            F.sum(F.col("_pdp").cast("decimal(28,0)")).alias("_sdp"),
            F.sum(F.col("_pc").cast("decimal(28,0)")).alias("_sc"),
            F.sum("_pn").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            (F.col("_sq").cast("decimal(38,4)") / 10000).cast("double").alias("sum_qty"),
            (F.col("_sbp").cast("decimal(38,4)") / 100).cast("double").alias("sum_base_price"),
            (F.col("_sdp").cast("decimal(38,4)") / 10000).cast("double").alias("sum_disc_price"),
            (F.col("_sc").cast("decimal(38,6)") / 1000000).cast("double").alias("sum_charge"),
            (
                (F.col("_sq").cast("decimal(38,4)") / 10000).cast("double")
                / F.col("count_order")
            ).alias("avg_qty"),
            (
                (F.col("_sbp").cast("decimal(38,4)") / 100).cast("double")
                / F.col("count_order")
            ).alias("avg_price"),
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
    # r13: long-unit revenue partials (see q1). cents*f2 is the exact
    # scale-4 value of the oracle's (18,4)x(18,4) product (2-decimal inputs;
    # equivalence pinned in tests/test_decimal_longsum.py); <= 1.1e9 per
    # row, so int64 holds ~8e9 rows per partition — unbounded in practice.
    rev4 = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
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
        .groupBy("n_name", F.spark_partition_id().alias("_pid"))
        .agg(F.sum(rev4).alias("_pr"), F.count(F.lit(1)).alias("_pn"))
        .groupBy("n_name")
        .agg(
            F.sum(F.col("_pr").cast("decimal(28,0)")).alias("_rev"),
            F.sum("_pn").alias("n_items"),
        )
        .select(
            "n_name",
            (F.col("_rev").cast("decimal(38,4)") / 10000).cast("double").alias("revenue"),
            "n_items",
        )
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
