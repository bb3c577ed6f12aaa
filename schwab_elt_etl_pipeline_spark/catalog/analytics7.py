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


def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: per customer, revenue over the trailing 90 DAYS
    of orders (value-based frame — peers by date distance, not row count;
    rowsBetween cannot express this when order cadence varies).

    One window exchange on o_custkey; the frame bound is an integer day
    ordinal so Spark's rangeBetween and DuckDB's RANGE BETWEEN agree
    exactly; the sum is exact decimal cast to double at output.
    """
    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("day_ord"))
        .rangeBetween(-90, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            day.alias("day_ord"),
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        )
        .withColumn("rev_90d", F.sum("price").over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "day_ord", "rev_90d")
    )


W_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey, day_ord,
       CAST(SUM(price) OVER (
         PARTITION BY o_custkey ORDER BY day_ord
         RANGE BETWEEN 90 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rev_90d
FROM (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_ord,
         CAST(o_totalprice AS DECIMAL(18,4)) AS price
  FROM orders
)
"""


def a_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: lineitem grouped by l_returnflag (three
    hot keys — the worst-case skew shape at 100 TB) through the two-phase
    salted aggregation (operators/skew.py), oracle-checked against the
    plain GROUP BY. Exact decimal partials make the result independent of
    the random salt assignment, which is what lets a salted plan be
    verified by value, not just by shape."""
    from schwab_elt_etl_pipeline_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "_s": F.sum(F.col("l_extendedprice").cast("decimal(18,4)")),
            "_c": F.count(F.lit(1)),
        },
        {"revenue": F.sum("_s"), "n_items": F.sum("_c")},
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("revenue").cast("double").alias("revenue"),
        F.col("n_items").cast("bigint").alias("n_items"),
    )


A_SALTED_SQL = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


def a_ols_trend_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of purchase values over time — slope and intercept
    from EXACT decimal moment sums (n, Σx, Σx², Σy, Σxy), finished by one
    IEEE division each.

    ``regr_slope``-style streaming aggregates accumulate floating partials
    whose combination order varies with parallelism; the decimal-moment form
    is order-independent (the engine-wide exactness discipline,
    ARCHITECTURE.md "Aggregation correctness at any parallelism"), so the
    same query is bit-equal on 4 cores and 4000 — and hash-matches DuckDB.
    One map-side-combinable aggregation; x is seconds since 2024-01-01 to
    keep moments inside decimal(38) headroom.
    """
    ev = load_table(spark, sf_dir, "events")
    # Determinism bounds: x is HOURS since 2024-01-01 (decimal(6,0)) and
    # value is exactly 2-decimal data (decimal(12,2)), so every moment's
    # SCALED integer stays far below 2^53 — each DECIMAL→DOUBLE cast is a
    # single correct rounding of an exactly-held rational, identical across
    # engines. (Second-granularity x pushes n·Σx² past 2^53, where the
    # engines' decimal→double paths can disagree by an ulp.) The intercept
    # is derived from the means and the already-cast slope — same IEEE
    # expression both sides.
    pts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        ((F.unix_timestamp("ts") - F.lit(1704067200)) / F.lit(3600))
        .cast("long")
        .alias("x"),
        F.col("value").cast("decimal(12,2)").alias("y"),
    )
    m = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x").cast("decimal(6,0)") * F.col("x").cast("decimal(6,0)")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(6,0)") * F.col("y")).alias("sxy"),
    )
    n_d = F.col("n").cast("decimal(20,0)")
    sx_d = F.col("sx").cast("decimal(20,0)")
    den = (n_d * F.col("sxx") - sx_d * sx_d).cast("double")
    num_s = (n_d * F.col("sxy") - sx_d * F.col("sy")).cast("double")
    slope = num_s / den
    intercept = (
        F.col("sy").cast("double") / F.col("n").cast("double")
        - slope * (F.col("sx").cast("double") / F.col("n").cast("double"))
    )
    ok = (F.col("n") >= 2) & (den != 0.0)
    return m.select(
        "user_id",
        "n",
        F.when(ok, slope).alias("slope"),
        F.when(ok, intercept).alias("intercept"),
    )


A_OLS_SQL = """
WITH pts AS (
  SELECT user_id,
         -- floor, not cast: Spark's unix_timestamp truncates sub-seconds,
         -- DuckDB's BIGINT cast would round them; // floors the hour
         (CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200) // 3600 AS x,
         CAST(value AS DECIMAL(12,2)) AS y
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(x) AS sx,
         SUM(CAST(x AS DECIMAL(6,0)) * CAST(x AS DECIMAL(6,0))) AS sxx,
         SUM(y) AS sy,
         SUM(CAST(x AS DECIMAL(6,0)) * y) AS sxy
  FROM pts GROUP BY user_id
)
SELECT user_id, n,
       CASE WHEN n >= 2 AND (n*sxx - sx*sx) <> 0
            THEN CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
       END AS slope,
       CASE WHEN n >= 2 AND (n*sxx - sx*sx) <> 0
            THEN CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
                   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       END AS intercept
FROM m
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


def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit INTERSECT / EXCEPT set operators (§2.7 beyond the anti-join
    form): customers with both an open ('O') and a finished ('F') order,
    minus customers who ever placed a 'P' order — intersect + except over
    key projections, each a distinct-combining shuffle on the key.

    (`intersect`/`exceptAll` map to Catalyst's INTERSECT/EXCEPT DISTINCT
    nodes, planned as aggregating joins — no row-at-a-time set logic.)
    """
    orders = load_table(spark, sf_dir, "orders")
    open_c = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_c = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    pend_c = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return open_c.intersect(done_c).exceptAll(pend_c.distinct()).select(
        F.col("o_custkey").alias("custkey")
    )


SET_INTERSECT_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
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
    QuerySpec("a_ols_trend_exact", a_ols_trend_exact, A_OLS_SQL,
              doc="per-group OLS slope/intercept from exact decimal moments"),
    QuerySpec("w_range_frame", w_range_frame, W_RANGE_FRAME_SQL,
              doc="trailing-90-day RANGE window frame"),
    QuerySpec("a_salted_hot_keys", a_salted_hot_keys, A_SALTED_SQL,
              doc="two-phase salted aggregation vs plain GROUP BY oracle"),
    QuerySpec("set_intersect_except", set_intersect_except, SET_INTERSECT_EXCEPT_SQL,
              doc="INTERSECT + EXCEPT set operators"),
]
