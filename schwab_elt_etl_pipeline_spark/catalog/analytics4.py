"""Analytics wave 3 — the remaining classic join/agg plan shapes.

Completes the TPC-H-family coverage begun in ``analytics``/``analytics2``:
q7/q8/q9/q11/q15/q20/q21 shapes adapted to the benchmark star schema (which
has no ``partsupp`` table and no commit/receipt dates on ``lineitem`` — the
adaptations keep each query's *plan shape*: nation-pair self-joined dims,
market-share conditional ratio, profit expression over two fact-dim joins,
HAVING-vs-scalar-subquery, argmax-by-group join-back, nested semi-join chain,
exists/not-exists correlated counting).

Plus engine capabilities the reference lacks but Spark gives natively:
CUBE (beyond the rollup already covered), PIVOT, moment statistics with
engine-order-independent arithmetic, and deterministic hash-mod sampling (the
scale-safe alternative to RAND() sampling for reproducible pipeline runs).

Decimal discipline per catalog/__init__.py: exact DECIMAL sums, one final
cast/divide in DOUBLE, identical aliases in Spark and oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.sources import load_table

_DEC = "decimal(18,4)"


def _dec(c: str) -> F.Column:
    return F.col(c).cast(_DEC)


def _revenue() -> F.Column:
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations, by year
# --------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: lineitem→supplier and orders→customer each resolve to a
    nation; keep the two (supp, cust) nation pairings and sum revenue by year.

    Scale shape: both nation dims broadcast; the only shuffles are the
    lineitem⨝orders join and the final 4-group aggregate (partial map-side)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))

    supp_n = F.broadcast(
        supp.join(n1, supp.s_nationkey == n1.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("supp_nation")
        )
    )
    cust_n = F.broadcast(
        cust.join(n1, cust.c_nationkey == n1.n_nationkey).select(
            "c_custkey", F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == cust_n.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_revenue()).alias("_rev"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("_rev").cast("double").alias("revenue"),
        )
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# Q8 shape: national market share within a region
# --------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: share of a region's PROMO-part order volume supplied by
    one nation, per year — a conditional-sum / total-sum ratio.

    Both sums are exact decimals; the share is a single double division, so
    the value is identical on any partitioning."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    cust_region = F.broadcast(
        cust.join(
            nation.join(region, nation.n_regionkey == region.r_regionkey),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_n = F.broadcast(
        supp.join(
            load_table(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
            ),
            supp.s_nationkey == F.col("sn_key"),
        ).select("s_suppkey", "supp_nation")
    )
    vol = _revenue()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == cust_region.c_custkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast(_DEC))).alias("_n"),
            F.sum(vol).alias("_d"),
        )
        .select(
            "o_year",
            (F.col("_n").cast("double") / F.col("_d").cast("double")).alias("mkt_share"),
        )
    )


Q8_SQL = """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n ON c_nationkey = n.n_nationkey
JOIN region   ON n.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# --------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (no partsupp in this schema: unit cost is modeled as
    half the part's retail price). profit = revenue − cost·quantity, summed by
    supplier nation and ship year, for parts named like '%gizmo%'."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gizmo%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supp_n = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey).select(
            "s_suppkey", F.col("n_name").alias("nation")
        )
    )
    cost = F.col("p_retailprice").cast("decimal(12,2)") * F.lit(0.5).cast("decimal(2,1)")
    amount = _revenue() - cost * F.col("l_quantity").cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp_n, li.l_suppkey == supp_n.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("o_year"))
        .agg(F.sum(amount).alias("_p"))
        .select("nation", "o_year", F.col("_p").cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                - CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1))
                  * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gizmo%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q11 shape: groups exceeding a share of the global total
# --------------------------------------------------------------------------


def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp: shipped revenue stands in for stock
    value): suppliers whose revenue exceeds 0.5 % of the global total —
    HAVING vs a scalar subquery, realized as a broadcast cross-join of the
    1-row total so the per-supplier aggregate shuffles once."""
    li = load_table(spark, sf_dir, "lineitem")
    # diamond: the 1-row total and the probe side both read per_supp. No
    # persist needed — AQE's ReuseExchange dedups the identical aggregation
    # exchange at runtime (one lineitem scan, verified in the executed plan),
    # with zero storage-memory footprint on a long-running driver.
    per_supp = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("_v"))
    total = per_supp.agg(F.sum("_v").alias("_t"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("_v").cast("double") > F.col("_t").cast("double") * 0.005)
        .select("l_suppkey", F.col("_v").cast("double").alias("value"))
    )


Q11_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS v
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, CAST(v AS DOUBLE) AS value
FROM per_supp
WHERE CAST(v AS DOUBLE) > (SELECT CAST(SUM(v) AS DOUBLE) FROM per_supp) * 0.005
"""


# --------------------------------------------------------------------------
# Q15 shape: argmax group(s) joined back
# --------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the supplier(s)
    hitting the maximum (scalar-max join-back instead of the reference view)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    # diamond shared by the max subquery and the probe — AQE ReuseExchange
    # dedups it at runtime; see q11_important_suppliers.
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("_r"))
    mx = rev.agg(F.max(F.col("_r")).alias("_m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("_r") == F.col("_m"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("_r").cast("double").alias("total_revenue")
        )
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


# --------------------------------------------------------------------------
# Q20 shape: nested semi-join chain
# --------------------------------------------------------------------------


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped > 300 units of 'red%' parts in
    1997 — part-filter → fact aggregate → HAVING → semi-join into the dim.
    Quantity sums go through DECIMAL so the HAVING boundary is exact."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    qualified = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_q"))
        .filter(F.col("_q") > F.lit(300).cast("decimal(12,2)"))
        .select("l_suppkey")
    )
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > CAST(300 AS DECIMAL(12,2))
)
"""


# --------------------------------------------------------------------------
# Q21 shape: exists / not-exists correlated counting
# --------------------------------------------------------------------------


def q21_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (no receipt/commit dates: 'R' return flag marks the
    failing line): count, per supplier, multi-supplier orders where that
    supplier is the *only* one with a returned line — the EXISTS(other
    supplier) ∧ NOT EXISTS(other supplier failing) pair, expressed as two
    aggregates instead of correlated subqueries (set-based, one shuffle each)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole_blame = (
        returned.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("_nr"),
            F.min("l_suppkey").alias("blame_suppkey"),
        )
        .filter(F.col("_nr") == 1)
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
        .filter(F.col("_ns") >= 2)
        .select("l_orderkey")
    )
    return (
        sole_blame.join(multi, "l_orderkey", "left_semi")
        .groupBy("blame_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("blame_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH returned AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
), sole_blame AS (
  SELECT l_orderkey, MIN(l_suppkey) AS blame_suppkey
  FROM returned GROUP BY l_orderkey HAVING COUNT(*) = 1
), multi AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) >= 2
)
SELECT s_name, COUNT(*) AS numwait
FROM sole_blame
JOIN multi USING (l_orderkey)
JOIN supplier ON blame_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# --------------------------------------------------------------------------
# CUBE aggregation (beyond the reference; rollup already covered)
# --------------------------------------------------------------------------


def a_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping combinations in
    one pass (Spark expands grouping sets map-side; one shuffle total)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).alias("_q"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            F.col("_q").cast("double").alias("sum_qty"),
            "n_rows",
        )
    )


A_CUBE_SQL = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# PIVOT (conditional aggregation in the oracle)
# --------------------------------------------------------------------------


def p_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order status into columns per priority: Spark's pivot() with an
    explicit value list (no extra distinct-discovery job; single shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    pv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)))
    )
    return pv.select(
        "o_orderpriority",
        F.coalesce(F.col("O").cast("double"), F.lit(0.0)).alias("open_total"),
        F.coalesce(F.col("F").cast("double"), F.lit(0.0)).alias("filled_total"),
        F.coalesce(F.col("P").cast("double"), F.lit(0.0)).alias("partial_total"),
    )


P_PIVOT_SQL = """
SELECT o_orderpriority,
       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS open_total,
       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS filled_total,
       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE), 0.0) AS partial_total
FROM orders
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Moment statistics with order-independent arithmetic
# --------------------------------------------------------------------------


def a_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: n, mean, sample stddev, min, max — variance from exact
    decimal power sums + one double division/sqrt, so the result does not
    depend on partial-aggregation order (engine-native STDDEV on doubles is
    order-sensitive and never matches across engines).

    The power-sum decimals stay NARROW (values are exact 2-dp): a wide-scale
    sum's int128 mantissa exceeds 2^53 and the decimal→double cast itself
    rounds differently per engine (observed 1-ulp stddev drift at scale 12)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(12,2)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("_s"),
        F.sum(v * v).alias("_ss"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    n = F.col("n")
    var = (ss - s * s / n) / (n - 1)
    # singleton groups: Spark (ANSI off) yields NULL for x/0, DuckDB yields
    # NaN under IEEE division — pin NULL on both sides explicitly
    return agg.select(
        "event_type",
        "n",
        (s / n).alias("mean_value"),
        F.when(F.col("n") > 1, F.sqrt(var)).alias("stddev_value"),
        "min_value",
        "max_value",
    )


A_STATS_SQL = """
WITH agg AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS ss,
         MIN(value) AS min_value, MAX(value) AS max_value
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       s / n AS mean_value,
       CASE WHEN n > 1 THEN SQRT((ss - s * s / n) / (n - 1)) END AS stddev_value,
       min_value, max_value
FROM agg
"""


# --------------------------------------------------------------------------
# Tumbling-window candles (batch form of streaming.windowed_candles)
# --------------------------------------------------------------------------


def t_tumbling_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows via ``F.window``: per (event_type, hour)
    OHLC candle over the events stream table. Same expression runs on a
    stream with a watermark (``streaming.windowed_candles``); open/close are
    deterministic via a (ts, event_id) tiebreak."""
    ev = load_table(spark, sf_dir, "events")
    tie = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min_by("value", tie).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", tie).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            "event_type",
            F.col("w.start").cast("timestamp_ntz").alias("h"),
            "open", "high", "low", "close", "n_ticks",
        )
    )


T_CANDLES_SQL = """
WITH ranked AS (
  SELECT event_type, date_trunc('hour', ts) AS h, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_z
  FROM events
)
SELECT event_type, h,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_z = 1 THEN value END) AS close,
       COUNT(*) AS n_ticks
FROM ranked
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Approximate quantiles (sketch), certified at verdict level
# --------------------------------------------------------------------------


def a_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (mergeable quantile sketch) per event_type — the
    scale path for quantiles: one pass, map-side mergeable partial sketches,
    error bounded by 1/accuracy in RANK (not value), vs the exact
    percentile's full sort.

    Sketch outputs are engine-specific, so the emitted row is the
    SQL-expressible certificate: the exact interpolated quantiles (anchoring
    grouping + percentile semantics to the oracle) plus per-quantile
    verdicts that each sketch value landed inside the exact rank window
    [p−0.01, p+0.01] — 100× looser than the sketch's own 1e-4 rank
    guarantee at accuracy=10000, so the verdict is deterministic while still
    pinning the estimate to its rank neighborhood."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").alias("_aq"),
        F.expr(
            "percentile(value, array(0.49, 0.5, 0.51, 0.89, 0.9, 0.91, 0.98, 0.99, 1.0))"
        ).alias("_eq"),
        F.count(F.lit(1)).alias("n"),
    )

    def ok(i_approx: int, lo: int, hi: int):
        return (F.col("_aq")[i_approx] >= F.col("_eq")[lo] - 1e-9) & (
            F.col("_aq")[i_approx] <= F.col("_eq")[hi] + 1e-9
        )

    return agg.select(
        "event_type",
        F.round(F.col("_eq")[1], 6).alias("exact_p50"),
        F.round(F.col("_eq")[4], 6).alias("exact_p90"),
        F.round(F.col("_eq")[7], 6).alias("exact_p99"),
        "n",
        ok(0, 0, 2).alias("p50_in_window"),
        ok(1, 3, 5).alias("p90_in_window"),
        ok(2, 6, 8).alias("p99_in_window"),
    )


A_APPROX_QUANTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
       ROUND(quantile_cont(value, 0.9), 6) AS exact_p90,
       ROUND(quantile_cont(value, 0.99), 6) AS exact_p99,
       COUNT(*) AS n,
       TRUE AS p50_in_window,
       TRUE AS p90_in_window,
       TRUE AS p99_in_window
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# UNPIVOT / melt (inverse of the pivot above)
# --------------------------------------------------------------------------


def p_unpivot_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via native ``unpivot``: the hourly OHLC candles from
    ``t_tumbling_candles`` unpivoted to (field, value) rows — one narrow
    projection, no shuffle beyond the candle build itself."""
    candles = t_tumbling_candles(spark, sf_dir)
    return candles.unpivot(
        ids=["event_type", "h"],
        values=["open", "high", "low", "close"],
        variableColumnName="field",
        valueColumnName="value",
    )


P_UNPIVOT_SQL = f"""
WITH candles AS ({T_CANDLES_SQL})
SELECT event_type, h, f.field, f.value
FROM candles,
LATERAL (VALUES ('open', open), ('high', high), ('low', low), ('close', close))
        AS f(field, value)
"""


# --------------------------------------------------------------------------
# Deterministic hash-mod sampling
# --------------------------------------------------------------------------


def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~5 % sample via integer hash-mod on the row key, then an
    aggregate over the sample. RAND()/TABLESAMPLE are not reproducible across
    engines or re-runs; key-hash sampling is, and prunes nothing from pushdown.
    The key is reduced mod 1000003 before multiplying so the arithmetic stays
    in int64 even for 100 TB-scale keys."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (
        (F.col("l_orderkey") % 1000003) * F.lit(2654435761)
        + F.col("l_linenumber") * F.lit(97)
    ) % 1000
    return (
        li.filter(h < 50)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(_dec("l_quantity")).alias("_q"),
        )
        .select("l_returnflag", "n_sampled", F.col("_q").cast("double").alias("sum_qty"))
    )


SAMPLE_SQL = """
SELECT l_returnflag, COUNT(*) AS n_sampled,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE ((l_orderkey % 1000003) * 2654435761 + l_linenumber * 97) % 1000 < 50
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Ranking-function family beyond row_number
# --------------------------------------------------------------------------


def w_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist over customers by account balance
    within each market segment (c_custkey tiebreak keeps every rank
    deterministic)."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


W_RANK_SQL = """
SELECT c_custkey, c_mktsegment,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
"""


# --------------------------------------------------------------------------
# Ordered string aggregation
# --------------------------------------------------------------------------


def a_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: per order priority, the sorted
    distinct set of ship modes… (schema has none) — statuses, joined. Spark
    has no ordered LISTAGG, so sort the collected array before joining
    (collect order is partition-dependent; array_sort fixes it)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.collect_set("o_orderstatus").alias("_s"))
        .select(
            "o_orderpriority",
            F.array_join(F.array_sort("_s"), ",").alias("statuses"),
        )
    )


A_COLLECT_SQL = """
SELECT o_orderpriority,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
FROM orders
GROUP BY o_orderpriority
"""


SPECS = [
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL,
              doc="Q7 shape: nation-pair volume by year"),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
              doc="Q8 shape: conditional-share ratio per year"),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL, headline=True,
              doc="Q9 shape: profit by nation/year (retail-price cost model)"),
    QuerySpec("q11_important_suppliers", q11_important_suppliers, Q11_SQL,
              doc="Q11 shape: HAVING vs scalar-subquery share threshold"),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              doc="Q15 shape: argmax join-back"),
    QuerySpec("q20_part_promotion", q20_part_promotion, Q20_SQL,
              doc="Q20 shape: nested semi-join chain"),
    QuerySpec("q21_blame_supplier", q21_blame_supplier, Q21_SQL,
              doc="Q21 shape: exists/not-exists correlated counting"),
    QuerySpec("a_cube_revenue", a_cube_revenue, A_CUBE_SQL,
              doc="CUBE grouping sets"),
    QuerySpec("p_pivot_status", p_pivot_status, P_PIVOT_SQL,
              doc="PIVOT with explicit value list"),
    QuerySpec("a_stats_moments", a_stats_moments, A_STATS_SQL,
              doc="moment stats via exact power sums"),
    QuerySpec("t_tumbling_candles", t_tumbling_candles, T_CANDLES_SQL, headline=True,
              doc="tumbling event-time OHLC candles (batch twin of the stream op)"),
    QuerySpec("sample_hash_mod", sample_hash_mod, SAMPLE_SQL,
              doc="deterministic hash-mod sampling"),
    QuerySpec("w_rank_family", w_rank_family, W_RANK_SQL,
              doc="ntile/percent_rank/cume_dist with deterministic tiebreak"),
    QuerySpec("a_approx_quantiles", a_approx_quantiles, A_APPROX_QUANTILES_SQL,
              doc="quantile sketch certified: exact anchors + rank-window verdicts"),
    QuerySpec("a_collect_sorted", a_collect_sorted, A_COLLECT_SQL,
              doc="ordered string aggregation (sorted collect_set)"),
    QuerySpec("p_unpivot_candles", p_unpivot_candles, P_UNPIVOT_SQL,
              doc="UNPIVOT/melt, inverse of the pivot shape"),
]
