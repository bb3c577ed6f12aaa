"""Second analytics wave: correlated-subquery, HAVING, conditional-CASE, and
percent-of-total shapes (TPC-H Q2/Q4/Q12/Q14/Q18 analogs on the available
columns). These stress Catalyst's subquery decorrelation and conditional
aggregation — surfaces the first wave doesn't touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.sources import load_table

_DEC = "decimal(18,4)"


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: per-part minimum-price supplier via a groupBy-rejoin
    (Catalyst's decorrelated form of the correlated MIN subquery)."""
    li = load_table(spark, sf_dir, "lineitem")
    cheapest = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("min_price")
    ).withColumnRenamed("l_partkey", "pk")
    return (
        li.join(
            cheapest,
            (F.col("l_partkey") == F.col("pk"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(F.col("l_partkey").alias("p_key"), "l_suppkey", "min_price")
        .groupBy("p_key", "min_price")
        .agg(F.min("l_suppkey").alias("supp"))  # deterministic on price ties
    )


Q2_SQL = """
SELECT l_partkey AS p_key, min_price, MIN(l_suppkey) AS supp
FROM lineitem l
JOIN (SELECT l_partkey AS pk, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey) m
  ON l.l_partkey = m.pk AND l.l_extendedprice = m.min_price
GROUP BY l_partkey, min_price
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS semi-join + count per priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    # semi-join on any lineitem with quantity >= 30 (commit/receipt dates
    # aren't in this dataset, so quantity stands in for the lateness predicate)
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    return (
        orders.join(
            big.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
            on="o_orderkey",
            how="left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 30)
GROUP BY o_orderpriority
"""


def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional CASE sums per group (high/low priority split)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percentage-of-total with conditional numerator, exact
    decimal sums, one deterministic division at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
                F.lit(0).cast("decimal(17,4)")
            )).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                 ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING over a grouped sum, re-joined for enrichment."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


Q18_SQL = """
SELECT c_name, o_orderkey, o_orderdate, o_totalprice, b.total_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
) b
JOIN orders   ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_daily_user_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window (row_number/rank family — absent from the reference but
    table stakes for an engine): top event per (user, day) by value."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("rk", F.row_number().over(
            Window.partitionBy("user_id", F.to_date("ts")).orderBy(
                F.desc("value"), F.asc("event_id")
            )
        ))
        .filter(F.col("rk") == 1)
        .select("user_id", F.to_date("ts").alias("d"), "event_id", "value")
    )


Q_RANK_SQL = """
SELECT user_id, CAST(ts AS DATE) AS d, event_id, value
FROM (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events
) WHERE rk = 1
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer, 4-way join + top-k."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("_r"))
        .select("c_custkey", "c_name", "n_name", F.col("_r").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey  = o_orderkey
JOIN customer ON o_custkey   = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: join with disjunctive (OR-of-conjunction) residual
    predicates — the optimizer must still extract the equi-key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    cond = (
        (F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 20))
    ) | (
        (F.col("p_brand") == "Brand#3") & (F.col("p_size").between(10, 30))
        & (F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 40)
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of customers by order count — left join
    preserving zero-order customers, then a count-of-counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("5")
    )
    per_cust = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left"
    ).groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '5%'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated AVG subquery — lines below 20% of their part's
    average quantity (decorrelated as a groupBy-rejoin)."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "pk")
    return (
        li.join(avg_qty, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_qty_revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN (SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a
  ON l.l_partkey = a.pk
WHERE l.l_quantity < 0.2 * a.avg_qty
"""


def q22_global_avg_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-average filter + anti-join — customers with
    above-average balance and no orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("c_acctbal")
            ).alias("a")
        )
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    no_orders = rich.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    )
    return no_orders.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double").alias("total_bal"),
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


SPECS = [
    QuerySpec("q12_shipmode_buckets", q12_shipmode_buckets, Q12_SQL,
              doc="conditional CASE sums"),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL,
              doc="decorrelated MIN subquery rejoin"),
    QuerySpec("q13_customer_distribution", q13_customer_distribution, Q13_SQL,
              doc="left join + count-of-counts"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue, Q17_SQL,
              doc="correlated AVG subquery, decorrelated"),
    QuerySpec("q22_global_avg_anti", q22_global_avg_anti, Q22_SQL,
              doc="scalar-avg filter + anti-join"),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              doc="4-way join + grouped top-k"),
    QuerySpec("q19_disjunctive_join", q19_disjunctive_join, Q19_SQL,
              doc="OR-of-conjunctions join residual"),
    QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL,
              doc="EXISTS semi-join + grouped count"),
    QuerySpec("q14_promo_share", q14_promo_share, Q14_SQL, headline=True,
              doc="percent-of-total, exact decimal"),
    QuerySpec("q18_large_orders", q18_large_orders, Q18_SQL, headline=True,
              doc="HAVING + enrichment joins"),
    QuerySpec("q_daily_user_rank", q_daily_user_rank, Q_RANK_SQL,
              doc="row_number ranking window"),
]
