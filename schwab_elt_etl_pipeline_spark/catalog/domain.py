"""Domain-shaped catalog queries.

``flagship_vertical_analytics`` is the engine's flagship: the reference's full
Gold-layer shape (SP_PROCESS_VERTS, docs/sql_server.md:399-586) — latest-tick
dedup, grid densification with LOCF, trailing/leading outlier windows, clamp,
rolling average, final MAX-pair dedup — applied to the ``events`` tick table.
``__spark_entry__.entry`` runs it at sf0.001.

Also here: the symbol-function pipeline (F2/F3) and the multi-format timestamp
parse (F5) as oracle-checked queries.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.functions.scalars import clamp
from schwab_elt_etl_pipeline_spark.functions.symbols import make_option_symbol, parse_option_symbol
from schwab_elt_etl_pipeline_spark.functions.timeutils import parse_multi_format_ts
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
from schwab_elt_etl_pipeline_spark.sources import load_table


def flagship_vertical_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-layer pipeline on events: per user_id ("contract"),
    A7 latest-per-hour → T9 LOCF grid → W1/W2 outlier flag → exclusion +
    [0,100] clamp (F10) → W3 rolling avg → A10 MAX-pair dedup."""
    # One exchange up front: hash(user_id) satisfies the grouped agg (subset
    # of (user_id, h)), the gapfill join, and every window below — the whole
    # pipeline then runs shuffle-free after this single repartition.
    n_part = spark.sparkContext.defaultParallelism
    ev = load_table(spark, sf_dir, "events").repartition(n_part, "user_id")
    hourly = (
        ev.withColumn("h", F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz"))
        .groupBy("user_id", "h")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
        # gapfill is a diamond (bounds agg + grid join both read hourly),
        # but this subtree is one cheap scan+agg: recomputing both branches
        # beats persist's materialization (A/B measured at sf0.1). Persist
        # diamond inputs only when the subtree is expensive.
    )
    dense = gapfill_locf(
        hourly, entity=["user_id"], ts="h", values=["value"], step="interval 1 hour"
    )
    base = Window.partitionBy("user_id").orderBy("h")
    w_pre = base.rowsBetween(-5, -1)
    w_fol = base.rowsBetween(1, 5)
    vdec = F.col("value").cast("decimal(18,6)")
    # materialize the 4 sliding aggregates once, flag from attribute refs
    # (window Columns embedded in the condition would be re-planted per
    # reference — Spark does not CSE duplicate window expressions)
    flagged = dense.select(
        "user_id", "h", "value",
        F.sum(vdec).over(w_pre).alias("_sp"), F.count("value").over(w_pre).alias("_cp"),
        F.sum(vdec).over(w_fol).alias("_sf"), F.count("value").over(w_fol).alias("_cf"),
    )
    avg_pre = F.col("_sp").cast("double") / F.col("_cp")
    avg_fol = F.col("_sf").cast("double") / F.col("_cf")
    oi = F.when(
        (((avg_pre - F.col("value")) > 50) & ((avg_fol - F.col("value")) > 50))
        | (((F.col("value") - avg_pre) > 50) & ((F.col("value") - avg_fol) > 50)),
        1,
    ).otherwise(0)
    clean = (
        flagged.withColumn("OI", oi)
        .filter(F.col("OI") != 1)
        .withColumn("o", clamp(F.col("value"), 0.0, 100.0))
        .drop("_sp", "_cp", "_sf", "_cf")
    )
    w_roll = Window.partitionBy("user_id").orderBy("h").rowsBetween(-10, 0)
    rolled = clean.withColumn(
        "avg_r",
        F.sum(F.col("o").cast("decimal(18,6)")).over(w_roll).cast("double")
        / F.count("o").over(w_roll),
    )
    return rolled.groupBy("user_id", "h").agg(
        F.max("o").alias("o"), F.max("avg_r").alias("avg_r")
    )


FLAGSHIP_SQL = """
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
), dense AS (
  SELECT g.user_id, g.h,
         LAST_VALUE(o.value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
  FROM grid g LEFT JOIN hourly o ON o.user_id = g.user_id AND o.h = g.h
), flagged AS (
  SELECT user_id, h, value,
    CASE WHEN ((CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(value) OVER w_pre - value) > 50
           AND (CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(value) OVER w_fol - value) > 50)
           OR ((value - CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(value) OVER w_pre) > 50
           AND (value - CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(value) OVER w_fol) > 50)
         THEN 1 ELSE 0 END AS OI
  FROM dense
  WINDOW
    w_pre AS (PARTITION BY user_id ORDER BY h ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
    w_fol AS (PARTITION BY user_id ORDER BY h ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING)
), clean AS (
  SELECT user_id, h, LEAST(GREATEST(value, 0.0), 100.0) AS o
  FROM flagged WHERE OI <> 1
), rolled AS (
  SELECT user_id, h, o,
    CAST(SUM(CAST(o AS DECIMAL(18,6))) OVER w_roll AS DOUBLE) / COUNT(o) OVER w_roll AS avg_r
  FROM clean
  WINDOW w_roll AS (PARTITION BY user_id ORDER BY h ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
)
SELECT user_id, h, MAX(o) AS o, MAX(avg_r) AS avg_r
FROM rolled GROUP BY user_id, h
"""


def f2_symbol_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3 as a pipeline: derive a deterministic option symbol per part,
    parse it back to (Strike, CP, Expiry) — the CROSS APPLY ParseSPXSymbol
    path (docs/sql_server.md:250,292) with no UDF."""
    p = load_table(spark, sf_dir, "part")
    expiry = F.lit(dt.date(2026, 8, 13))
    cp = F.when(F.col("p_size") > 25, 1).otherwise(-1)
    strike = ((F.col("p_partkey") % 200) * 5 + 5000).cast("int")
    sym = make_option_symbol("SPXW", expiry, cp, strike)
    parsed = parse_option_symbol(sym)
    return p.select(
        "p_partkey",
        sym.alias("symbol"),
        parsed["Strike"].alias("strike"),
        parsed["CP"].cast("int").alias("cp"),
        parsed["Expiry"].alias("expiry"),
    )


F2_SQL = """
SELECT p_partkey,
       printf('%-6s%s%s%08d', 'SPXW', strftime(DATE '2026-08-13', '%y%m%d'),
              CASE WHEN p_size > 25 THEN 'C' ELSE 'P' END,
              ((p_partkey % 200) * 5 + 5000) * 1000) AS symbol,
       CAST(((p_partkey % 200) * 5 + 5000) AS INT) AS strike,
       CASE WHEN p_size > 25 THEN 1 ELSE -1 END AS cp,
       DATE '2026-08-13' AS expiry
FROM part
"""


def f5_multiformat_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: multi-format timestamp parsing (tools/utils.py:22-82) — render
    o_orderdate in one of 4 formats chosen by key, then parse them all back
    with the engine's coalescing parser."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4
    rendered = (
        F.when(k == 0, F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"))
        .when(k == 1, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .when(k == 2, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .otherwise(F.date_format("o_orderdate", "MM/dd/yyyy"))
    )
    return o.select(
        "o_orderkey",
        rendered.alias("rendered"),
        parse_multi_format_ts(rendered).cast("timestamp_ntz").alias("parsed"),
    )


F5_SQL = """
SELECT o_orderkey,
       CASE o_orderkey % 4
         WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
         WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
         WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
         ELSE strftime(o_orderdate, '%m/%d/%Y')
       END AS rendered,
       COALESCE(
         try_strptime(CASE o_orderkey % 4
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
             WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
             ELSE strftime(o_orderdate, '%m/%d/%Y') END, '%Y-%m-%dT%H:%M:%S'),
         try_strptime(CASE o_orderkey % 4
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
             WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
             ELSE strftime(o_orderdate, '%m/%d/%Y') END, '%Y-%m-%d %H:%M:%S'),
         try_strptime(CASE o_orderkey % 4
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
             WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
             ELSE strftime(o_orderdate, '%m/%d/%Y') END, '%Y-%m-%d'),
         try_strptime(CASE o_orderkey % 4
             WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')
             WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
             WHEN 2 THEN strftime(o_orderdate, '%Y-%m-%d')
             ELSE strftime(o_orderdate, '%m/%d/%Y') END, '%m/%d/%Y')
       ) AS parsed
FROM orders
"""


SPECS = [
    QuerySpec(
        "flagship_vertical_analytics",
        flagship_vertical_analytics,
        FLAGSHIP_SQL,
        headline=True,
        doc="full Gold-layer shape: dedup→LOCF grid→outlier windows→clamp→rolling avg",
    ),
    QuerySpec("f2_symbol_pipeline", f2_symbol_pipeline, F2_SQL, doc="F2/F3 symbol gen+parse"),
    QuerySpec("f5_multiformat_parse", f5_multiformat_parse, F5_SQL, doc="F5 multi-format ts parse"),
]
