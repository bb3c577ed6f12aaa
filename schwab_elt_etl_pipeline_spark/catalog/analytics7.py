"""SQL-surface completeness wave: distribution window functions, arbitrary
GROUPING SETS, and calendar interval arithmetic.

These round out §2.4/§2.5 beyond what the reference itself exercises — the
"free wins" a reference user gains from Catalyst (same rationale as
analytics3's ROLLUP/CUBE): every query here is a single declarative plan
with partial aggregation / single-exchange windows, nothing exotic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.sources import load_table


def w_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over order values per customer
    segment — one window, one exchange. The ORDER BY carries o_orderkey as
    a unique tiebreaker so every rank function is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    seg = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == F.col("c_custkey"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    return seg.select(
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


W_DISTRIBUTION_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY o_totalprice, o_orderkey)
"""


def a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — (status, priority), (status), (priority),
    () — with grouping_id to disambiguate NULL-as-total from NULL-as-value.
    Catalyst expands this to one Expand + single aggregation (one shuffle
    for all four granularities)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS INT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM _orders_gs
        GROUP BY GROUPING SETS (
          (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ()
        )
        """
    )


A_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS (
  (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority), ()
)
"""


def t_calendar_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar interval functions over order dates: add_months / last_day /
    quarter bucketing / day-count to ship deadline — all codegen'd date
    intrinsics, no timezone dependence (dates, not instants)."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_orderkey",
        d.alias("order_date"),
        F.add_months(d, 3).alias("due_date"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.datediff(F.last_day(d), d).cast("int").alias("days_to_month_end"),
        F.dayofweek(d).cast("int").alias("dow"),
    )


T_CALENDAR_SQL = """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS due_date,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE) AS quarter_start,
       CAST(date_diff('day', CAST(o_orderdate AS DATE),
                      last_day(CAST(o_orderdate AS DATE))) AS INT) AS days_to_month_end,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow
FROM orders
"""


def j11_merge_full_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-branch MERGE (update / delete / insert) over a derived target
    and source: target = orders with key % 4 ≠ 3, source = doubled-price
    rows with key % 2 = 0, tombstone when status = 'F'. One key-shuffle —
    the action branches are expressions over a single join, not three
    passes (operators/merge.py merge_full)."""
    from schwab_elt_etl_pipeline_spark.operators.merge import merge_full

    orders = load_table(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 4 != 3).select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double").alias("price")
    )
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice").cast("double") * F.lit(2.0)).alias("price"),
    )
    return merge_full(
        source, target, keys=["o_orderkey"],
        delete_condition=F.col("o_orderstatus") == "F",
    )


J11_MERGE_FULL_SQL = """
WITH tgt AS (
  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 4 <> 3
),
src AS (
  SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) * 2.0 AS price
  FROM orders WHERE o_orderkey % 2 = 0
),
actions AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'update' END AS a
  FROM src
)
SELECT t.o_orderkey, t.o_orderstatus, t.price
FROM tgt t LEFT JOIN actions USING (o_orderkey) WHERE a IS NULL
UNION ALL
SELECT s.o_orderkey, s.o_orderstatus, s.price
FROM src s JOIN actions USING (o_orderkey)
JOIN tgt USING (o_orderkey) WHERE a = 'update'
UNION ALL
SELECT s.o_orderkey, s.o_orderstatus, s.price
FROM src s JOIN actions USING (o_orderkey)
LEFT JOIN tgt USING (o_orderkey)
WHERE a <> 'delete' AND tgt.o_orderkey IS NULL
"""


SPECS = [
    QuerySpec("w_distribution_family", w_distribution_family, W_DISTRIBUTION_SQL,
              doc="ntile/percent_rank/cume_dist distribution windows"),
    QuerySpec("a_grouping_sets", a_grouping_sets, A_GROUPING_SETS_SQL,
              doc="arbitrary GROUPING SETS with grouping_id"),
    QuerySpec("t_calendar_arithmetic", t_calendar_arithmetic, T_CALENDAR_SQL,
              doc="add_months/last_day/quarter calendar intrinsics"),
    QuerySpec("j11_merge_full_delete", j11_merge_full_delete, J11_MERGE_FULL_SQL,
              doc="three-branch MERGE with delete tombstones"),
]
