"""SURVEY §2 operator inventory, demonstrated over the benchmark tables.

One catalog entry per operator family, named after the §2 ids. Each query uses
the engine's own operator/function library where one exists (insert_new,
merge_upsert, gapfill_locf, window trio, time-of-day predicates), so the
correctness gate exercises the same code paths the domain pipelines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.functions.timeutils import time_of_day_between
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
from schwab_elt_etl_pipeline_spark.operators.merge import insert_new, merge_upsert
from schwab_elt_etl_pipeline_spark.sources import load_table

_DEC = "decimal(18,4)"


# --------------------------------------------------------------------------
# S1/P1/P2: projection + rename + equality filter (sql/opt.sql:355-358)
# --------------------------------------------------------------------------
def s1_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linestatus") == "O").select(
        F.col("l_orderkey").alias("OK"),
        F.col("l_linenumber").alias("LN"),
        F.col("l_quantity").alias("Q"),
        F.col("l_extendedprice").alias("P"),
    )


S1_SQL = """
SELECT l_orderkey AS OK, l_linenumber AS LN, l_quantity AS Q, l_extendedprice AS P
FROM lineitem WHERE l_linestatus = 'O'
"""


# --------------------------------------------------------------------------
# P3/P4/P7/P8: inequality, null guards, IN-list + <>, parameterized range
# (docs/sql_server.md:251,272-274; sql/opt.sql:318; tools/schwab.py:1065)
# --------------------------------------------------------------------------
def p_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "P")
        & F.col("o_totalprice").isNotNull()
        & (F.col("o_totalprice") != 0)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp_ntz"), F.lit("1997-12-31").cast("timestamp_ntz")
        )
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate")


P_PREDICATES_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_orderdate
FROM orders
WHERE o_orderstatus <> 'P' AND o_totalprice IS NOT NULL AND o_totalprice <> 0
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
"""


# --------------------------------------------------------------------------
# P5/P6: time-of-day window + date extraction (docs/sql_server.md:307,433)
# --------------------------------------------------------------------------
def p5_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(time_of_day_between("ts", "06:30:00", "13:00:00")).filter(
        F.to_date("ts").between(F.lit("2024-01-05"), F.lit("2024-01-09"))
    ).select("event_id", "ts", "user_id", "event_type")


P5_SQL = """
SELECT event_id, ts, user_id, event_type
FROM events
WHERE (EXTRACT(hour FROM ts)*3600 + EXTRACT(minute FROM ts)*60 + EXTRACT(second FROM ts)::INT)
      BETWEEN 6*3600+30*60 AND 13*3600
  AND CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-09'
"""


# --------------------------------------------------------------------------
# J1: left equi-join, 1 key (sql/opt.sql:302)
# --------------------------------------------------------------------------
def j1_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment"
    )


J1_SQL = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# J2: left equi-join on composite key (sql/opt.sql:303) — next line of the
# same order, keyed (orderkey, linenumber+1)
# --------------------------------------------------------------------------
def j2_left_join_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cur = li.select("l_orderkey", "l_linenumber", "l_extendedprice")
    nxt = li.select(
        F.col("l_orderkey").alias("n_orderkey"),
        (F.col("l_linenumber") - 1).alias("n_prev_line"),
        F.col("l_extendedprice").alias("next_price"),
    )
    return cur.join(
        nxt,
        (cur.l_orderkey == nxt.n_orderkey) & (cur.l_linenumber == nxt.n_prev_line),
        "left",
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "next_price")


J2_SQL = """
SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, n.l_extendedprice AS next_price
FROM lineitem l
LEFT JOIN lineitem n
  ON n.l_orderkey = l.l_orderkey AND n.l_linenumber = l.l_linenumber + 1
"""


# --------------------------------------------------------------------------
# J3/J9: left-anti "insert where not exists" via the engine's insert_new
# (sql/opt.sql:362-367; tools/db.py:707-1028)
# --------------------------------------------------------------------------
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return insert_new(c, o, keys=["c_custkey"])


J3_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --------------------------------------------------------------------------
# J4: surrogate-key resolution through a natural-key join
# (docs/sql_server.md:297-309). Portable surrogate: md5 of the natural key
# (the domain pipelines use xxhash64; md5 exists in both engines for the
# differential test).
# --------------------------------------------------------------------------
def j4_surrogate_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dim = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .withColumn(
            "ps_id", F.md5(F.concat_ws("|", F.col("l_partkey"), F.col("l_suppkey")))
        )
    )
    return (
        li.join(dim, on=["l_partkey", "l_suppkey"], how="inner")
        .groupBy("ps_id")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("total_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


J4_SQL = """
SELECT md5(l_partkey || '|' || l_suppkey) AS ps_id,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# J5: self-join with hybrid equi + arithmetic band condition
# (docs/sql_server.md:458-476) — parts of the same type exactly 5 sizes apart
# mirrors legs of the same (T, CP) exactly W strikes apart.
# --------------------------------------------------------------------------
def j5_self_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_type").alias("p_type"),
        F.col("p_size").alias("a_size"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_type").alias("p_type"),
        F.col("p_size").alias("b_size"),
    )
    return a.join(b, on="p_type", how="inner").filter(
        F.col("b_size") == F.col("a_size") + 5
    ).select("p_type", "a_key", "a_size", "b_key", "b_size")


J5_SQL = """
SELECT a.p_type, a.p_partkey AS a_key, a.p_size AS a_size,
       b.p_partkey AS b_key, b.p_size AS b_size
FROM part a JOIN part b
  ON a.p_type = b.p_type AND b.p_size = a.p_size + 5
"""


# --------------------------------------------------------------------------
# J6: left-semi via IN/EXISTS (sql/opt.sql:309-311)
# --------------------------------------------------------------------------
def j6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(
        big.select(F.col("l_orderkey").alias("o_orderkey")), on="o_orderkey", how="left_semi"
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


J6_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
"""


# --------------------------------------------------------------------------
# J7: MERGE insert-only through the engine's merge_upsert
# (docs/sql_server.md:317-329) — 'F' orders are the target, 'O' orders the
# incoming batch; matched keys keep the target row.
# --------------------------------------------------------------------------
def j7_merge_insert_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.filter(F.col("o_orderstatus") == "F")
    source = o.filter(F.col("o_orderstatus").isin("O", "P"))
    return merge_upsert(source, target, keys=["o_orderkey"], insert_only=True)


J7_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders s
WHERE s.o_orderstatus IN ('O','P')
  AND NOT EXISTS (SELECT 1 FROM orders t WHERE t.o_orderstatus = 'F' AND t.o_orderkey = s.o_orderkey)
"""


# --------------------------------------------------------------------------
# J8: MERGE update+insert (tools/db.py:302-314,595-609) — the updated batch
# (BUILDING customers, re-rated balance) wins on matched keys.
# --------------------------------------------------------------------------
def j8_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    source = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal").cast(_DEC) + F.lit(1000).cast(_DEC))
            .cast("double")
            .alias("c_acctbal"),
        )
    )
    return merge_upsert(source, c, keys=["c_custkey"])


J8_SQL = """
SELECT c_custkey, c_name,
       CASE WHEN c_mktsegment = 'BUILDING'
            THEN CAST(CAST(c_acctbal AS DECIMAL(18,4)) + CAST(1000 AS DECIMAL(18,4)) AS DOUBLE)
            ELSE c_acctbal END AS c_acctbal
FROM customer
"""


# --------------------------------------------------------------------------
# J10 + A3: left-join enrichment of an aggregate (sql/opt.sql:313-318)
# --------------------------------------------------------------------------
def j10_join_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    subs = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("total_qty"),
    )
    return o.join(
        subs, o.o_orderkey == subs.l_orderkey, "left"
    ).select("o_orderkey", "o_totalprice", "n_lines", "total_qty")


J10_SQL = """
SELECT o_orderkey, o_totalprice, s.n_lines, s.total_qty
FROM orders
LEFT JOIN (
  SELECT l_orderkey, COUNT(*) AS n_lines,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
) s ON o_orderkey = s.l_orderkey
"""


# --------------------------------------------------------------------------
# A1/A2: GROUP BY over all columns = dedup / distinct (sql/opt.sql:353-359)
# --------------------------------------------------------------------------
def a1_dedup_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").dropDuplicates()


A1_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem
"""


# --------------------------------------------------------------------------
# A2: distinct-entities extraction (docs/sql_server.md:244-253: unique
# contracts from parsed symbols)
# --------------------------------------------------------------------------
def a2_distinct_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").distinct()


A2_SQL = """
SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
"""


# --------------------------------------------------------------------------
# J9: batch-level natural-key dedup with a DETERMINISTIC survivor (the
# set-based form of the per-row IF NOT EXISTS guards, tools/db.py:707-1028;
# dropDuplicates keeps an arbitrary row, so the engine uses max_by/ROW_NUMBER
# when the surviving row matters)
# --------------------------------------------------------------------------
def j9_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max_by(F.struct("event_id", "ts", "value"), F.struct("ts", "event_id")).alias("r")
    ).select("user_id", "event_type", "r.event_id", "r.ts", "r.value")


J9_SQL = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT user_id, event_type, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# P9: stream content filter — drop records with missing payload fields
# (services/schwab_stream.py:294-304,316-324)
# --------------------------------------------------------------------------
def p9_content_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.col("value").isNotNull()
        & F.col("props").isNotNull()
        & (F.col("event_type") != "error")
    ).select("event_id", "user_id", "event_type", "value")


P9_SQL = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE value IS NOT NULL AND props IS NOT NULL AND event_type <> 'error'
"""


# --------------------------------------------------------------------------
# A3-A6: the transactions aggregation shape (sql/opt.sql:282-332): inner
# leg-level group with signed avg + MAX-as-pivot fill, outer re-aggregation.
# l_returnflag='R' plays BUY (negated price); partkey plays the symbol.
# --------------------------------------------------------------------------
def a3a6_two_level_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    signed = F.when(
        F.col("l_returnflag") == "R", -F.col("l_extendedprice").cast(_DEC)
    ).otherwise(F.col("l_extendedprice").cast(_DEC))
    inner = li.groupBy("l_orderkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast(_DEC)).alias("_aq"),
        F.sum(signed).alias("_p_sum"),
        F.count(F.lit(1)).alias("_n"),
        F.max(
            F.when(F.col("l_returnflag") != "R", F.col("l_partkey").cast("string"))
        ).alias("SS"),
        F.max(
            F.when(F.col("l_returnflag") == "R", F.col("l_partkey").cast("string"))
        ).alias("LS"),
    ).select(
        "l_orderkey",
        F.col("_aq").cast("double").alias("AQ"),
        (F.col("_p_sum").cast("double") / F.col("_n")).alias("P"),
        "SS",
        "LS",
    )
    return inner.groupBy("l_orderkey").agg(
        F.sum(F.col("P").cast(_DEC)).cast("double").alias("P"),
        F.max("SS").alias("SS"),
        F.max("LS").alias("LS"),
        F.count(F.lit(1)).alias("n_legs"),
    )


A3A6_SQL = """
WITH legs AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS AQ,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -CAST(l_extendedprice AS DECIMAL(18,4))
                       ELSE CAST(l_extendedprice AS DECIMAL(18,4)) END) AS DOUBLE) / COUNT(*) AS P,
         MAX(CASE WHEN l_returnflag <> 'R' THEN CAST(l_partkey AS VARCHAR) END) AS SS,
         MAX(CASE WHEN l_returnflag = 'R' THEN CAST(l_partkey AS VARCHAR) END) AS LS
  FROM lineitem
  GROUP BY l_orderkey, l_partkey
)
SELECT l_orderkey,
       CAST(SUM(CAST(P AS DECIMAL(18,4))) AS DOUBLE) AS P,
       MAX(SS) AS SS, MAX(LS) AS LS, COUNT(*) AS n_legs
FROM legs GROUP BY l_orderkey
"""


# --------------------------------------------------------------------------
# A7: MAX per (entity, timestamp) tick-collision collapse
# (docs/sql_server.md:297-309)
# --------------------------------------------------------------------------
def a7_max_per_entity_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "ts").agg(F.max("value").alias("O"))


A7_SQL = """
SELECT user_id, ts, MAX(value) AS O FROM events GROUP BY user_id, ts
"""


# --------------------------------------------------------------------------
# A8 + F11 + F20: bucket-rounded scalar MIN/MAX over a 2-hour window
# (docs/sql_server.md:429-434)
# --------------------------------------------------------------------------
def a8_bucket_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    start = F.lit("2024-01-05 00:00:00").cast("timestamp_ntz")
    return (
        ev.filter(
            (F.col("ts") >= start) & (F.col("ts") < start + F.expr("INTERVAL 2 HOURS"))
        )
        .agg(
            (F.round(F.min("value") / 5, 0) * 5).alias("range_lo"),
            (F.round(F.max("value") / 5, 0) * 5).alias("range_hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


A8_SQL = """
SELECT ROUND(MIN(value)/5, 0)*5 AS range_lo,
       ROUND(MAX(value)/5, 0)*5 AS range_hi,
       COUNT(*) AS n
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <  TIMESTAMP '2024-01-05 00:00:00' + INTERVAL 2 HOUR
"""


# --------------------------------------------------------------------------
# A10: final MAX-pair dedup (docs/sql_server.md:553-572)
# --------------------------------------------------------------------------
def a10_dedup_max_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.max("value").alias("O"), F.max("ts").alias("last_ts")
    )


A10_SQL = """
SELECT user_id, event_type, MAX(value) AS O, MAX(ts) AS last_ts
FROM events GROUP BY user_id, event_type
"""


# --------------------------------------------------------------------------
# W1-W3 + outlier flag (docs/sql_server.md:484-502,562-568): the Gold-layer
# window trio. Frame averages are computed as exact-decimal frame sums over
# deterministic counts so sliding-window summation order (segment trees vs
# running sums) cannot perturb the doubles.
# --------------------------------------------------------------------------
def w_moving_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_pre = base.rowsBetween(-5, -1)
    w_fol = base.rowsBetween(1, 5)
    w_roll = base.rowsBetween(-10, 0)
    vdec = F.col("value").cast("decimal(18,6)")
    avg_pre = F.sum(vdec).over(w_pre).cast("double") / F.count("value").over(w_pre)
    avg_fol = F.sum(vdec).over(w_fol).cast("double") / F.count("value").over(w_fol)
    avg_r = F.sum(vdec).over(w_roll).cast("double") / F.count("value").over(w_roll)
    oi = F.when(
        (((avg_pre - F.col("value")) > 50) & ((avg_fol - F.col("value")) > 50))
        | (((F.col("value") - avg_pre) > 50) & ((F.col("value") - avg_fol) > 50)),
        1,
    ).otherwise(0)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        avg_pre.alias("avg_pre"),
        avg_fol.alias("avg_fol"),
        avg_r.alias("avg_r"),
        oi.alias("OI"),
    )


W_SQL = """
SELECT user_id, event_id, ts, value,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(value) OVER w_pre AS avg_pre,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(value) OVER w_fol AS avg_fol,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_roll AS DOUBLE) / COUNT(value) OVER w_roll AS avg_r,
  CASE WHEN ((CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(value) OVER w_pre - value) > 50
         AND (CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(value) OVER w_fol - value) > 50)
         OR ((value - CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(value) OVER w_pre) > 50
         AND (value - CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(value) OVER w_fol) > 50)
       THEN 1 ELSE 0 END AS OI
FROM events
WINDOW
  w_pre  AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
  w_fol  AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING),
  w_roll AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# O2/O3: deterministic sort + limit (tools/db.py:446-452,140-145)
# --------------------------------------------------------------------------
def o2_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(5)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )


O2_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 5
"""


# --------------------------------------------------------------------------
# SET: union of two symmetric branches with a literal discriminator
# (services/schwab_chains_service.py:166-177 call+put concat)
# --------------------------------------------------------------------------
def set_union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.lit(1).alias("CP")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", F.lit(-1).alias("CP")
    )
    return clicks.unionByName(views)


SET_SQL = """
SELECT event_id, user_id, 1 AS CP FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, user_id, -1 AS CP FROM events WHERE event_type = 'view'
"""


# --------------------------------------------------------------------------
# T3: latest-value per key (tools/redis_cache.py:19-27) — max_by/arg_max with
# a unique (ts, event_id) tiebreaker.
# --------------------------------------------------------------------------
def t3_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("last_value"),
        F.max("ts").alias("last_ts"),
    )


T3_SQL = """
WITH ranked AS (
  SELECT user_id, value, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         MAX(ts) OVER (PARTITION BY user_id) AS last_ts
  FROM events
)
SELECT user_id, value AS last_value, last_ts FROM ranked WHERE rn = 1
"""


# --------------------------------------------------------------------------
# T9: gap-fill/LOCF through the engine's gapfill operator (SURVEY T9):
# hourly resample of each user's value series, forward-filled.
# --------------------------------------------------------------------------
def t9_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("h", F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz"))
        .groupBy("user_id", "h")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
        # gapfill reads its input twice (bounds + observations) but this
        # subtree is ONE cheap scan+agg — recomputing it costs less than
        # persist's materialization (measured ~0.7s vs ~1.4s at sf0.1).
        # Persist diamond inputs only when the subtree is expensive
        # (see pipeline_verts_e2e's parsed marks).
    )
    return gapfill_locf(
        hourly, entity=["user_id"], ts="h", values=["value"], step="interval 1 hour"
    )


T9_SQL = """
WITH ranked AS (
  SELECT user_id, date_trunc('hour', ts) AS h, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), hourly AS (
  SELECT user_id, h, value FROM ranked WHERE rn = 1
), bounds AS (
  SELECT user_id, MIN(h) AS mn, MAX(h) AS mx FROM hourly GROUP BY user_id
), grid AS (
  SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds
), joined AS (
  SELECT g.user_id, g.h, o.value
  FROM grid g LEFT JOIN hourly o ON o.user_id = g.user_id AND o.h = g.h
)
SELECT user_id, h,
       LAST_VALUE(value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM joined
"""


# --------------------------------------------------------------------------
# F16: semi-structured JSON columns — parse, extract, re-serialize
# (tools/db.py:741 keeps raw JSON; services/schwab_stream.py:281 parses it).
# events.props carries JSON documents like {"k": 87}.
# --------------------------------------------------------------------------
def f16_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        parsed["k"].alias("k"),
        F.to_json(F.struct(F.col("event_id"), parsed["k"].alias("k"))).alias("audit_json"),
    )


F16_SQL = """
SELECT event_id,
       CAST(props->>'$.k' AS INT) AS k,
       '{"event_id":' || event_id || ',"k":' || CAST(props->>'$.k' AS INT) || '}' AS audit_json
FROM events
"""


SPECS = [
    QuerySpec("s1_scan_projection", s1_scan_projection, S1_SQL, doc="P1/P2 projection+rename+filter"),
    QuerySpec("f16_json_extract", f16_json_extract, F16_SQL, doc="F16 JSON parse/extract/serialize"),
    QuerySpec("p_predicates", p_predicates, P_PREDICATES_SQL, doc="P3/P4/P7/P8 predicates"),
    QuerySpec("p5_time_of_day", p5_time_of_day, P5_SQL, doc="P5/P6 time-of-day + date filters"),
    QuerySpec("j1_left_join", j1_left_join, J1_SQL, doc="J1 left equi-join"),
    QuerySpec("j2_left_join_composite", j2_left_join_composite, J2_SQL, doc="J2 composite-key left join"),
    QuerySpec("j3_anti_join", j3_anti_join, J3_SQL, doc="J3/J9 left-anti insert-new"),
    QuerySpec("j4_surrogate_resolve", j4_surrogate_resolve, J4_SQL, doc="J4 natural-key → surrogate"),
    QuerySpec("j5_self_band_join", j5_self_band_join, J5_SQL, headline=True, doc="J5 equi+band self-join"),
    QuerySpec("j6_semi_join", j6_semi_join, J6_SQL, doc="J6 left-semi"),
    QuerySpec("j7_merge_insert_only", j7_merge_insert_only, J7_SQL, doc="J7 MERGE insert-only"),
    QuerySpec("j8_merge_upsert", j8_merge_upsert, J8_SQL, doc="J8 MERGE update+insert"),
    QuerySpec("j10_join_aggregate", j10_join_aggregate, J10_SQL, doc="J10 join to aggregate"),
    QuerySpec("a1_dedup_distinct", a1_dedup_distinct, A1_SQL, doc="A1 distinct dedup"),
    QuerySpec("a2_distinct_entities", a2_distinct_entities, A2_SQL, doc="A2 distinct entities"),
    QuerySpec("j9_batch_dedup", j9_batch_dedup, J9_SQL, doc="J9 deterministic natural-key dedup"),
    QuerySpec("p9_content_filter", p9_content_filter, P9_SQL, doc="P9 stream content filter"),
    QuerySpec("a3a6_two_level_signed", a3a6_two_level_signed, A3A6_SQL, doc="A3-A6 two-level signed agg"),
    QuerySpec("a7_max_per_entity_ts", a7_max_per_entity_ts, A7_SQL, doc="A7 MAX per (entity,T)"),
    QuerySpec("a8_bucket_minmax", a8_bucket_minmax, A8_SQL, doc="A8/F11/F20 bucketed scalar range"),
    QuerySpec("a10_dedup_max_pair", a10_dedup_max_pair, A10_SQL, doc="A10 MAX-pair dedup"),
    QuerySpec("w_moving_avgs", w_moving_avgs, W_SQL, headline=True, doc="W1-W3 window trio + outlier"),
    QuerySpec("o2_sort_limit", o2_sort_limit, O2_SQL, doc="O2/O3 sort+limit"),
    QuerySpec("set_union_branches", set_union_branches, SET_SQL, doc="§2.7 union of branches"),
    QuerySpec("t3_latest_per_key", t3_latest_per_key, T3_SQL, doc="T3 latest per key"),
    QuerySpec("t9_gapfill_locf", t9_gapfill_locf, T9_SQL, headline=True, doc="T9 grid+LOCF gapfill"),
]
