"""End-to-end verticals pipeline as an oracle-checked catalog query.

This runs the reference's FULL flagship path (SURVEY §3.1: SP_IMPORT_PARQUET →
SP_IMPORT_PARQUET_OPT_DATA → SP_PROCESS_VERTS) over ticks derived
deterministically from ``lineitem``:

  tick construction (F3 symbol gen, epoch-ms encode) →
  Silver: symbol parse (F2), tz convert (F4), session filter (P5),
          MAX-per-(contract,T) dedup (A7) →
  Gold:   per-leg minute grid + LOCF (T9), short/long pairing at width 5 (J5),
          trailing/leading outlier windows (W1/W2), clamp [0,W] (F10),
          10-row rolling average (W3), MAX-pair dedup (A10).

Output is keyed by the spread's NATURAL key (SS, CP, Expiry, T) — surrogate
hash ids stay internal — so the whole pipeline is ANSI-SQL-expressible and
oracle-checked end-to-end. 600k lineitem rows collapse onto 82 contracts ×
421 minutes, so the A7 dedup and the window stages carry real weight in the
benchmark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.functions.scalars import clamp
from schwab_elt_etl_pipeline_spark.functions.symbols import make_option_symbol
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
from schwab_elt_etl_pipeline_spark.plans.silver import parse_quotes
from schwab_elt_etl_pipeline_spark.sources import load_table

_DAY = "2024-06-17"
_EXPIRY = "2024-06-21"
_WIDTH = 5
_SESSION_END = f"{_DAY} 13:00:00"


def _ticks_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic tick synthesis: strike/CP/minute/mark derived from
    lineitem keys; encoded as real stream records (symbol string + epoch-ms)
    so Silver exercises the full F2/F4 decode path.

    Scale shape: the raw rows collapse onto |strikes| × |CP| × |minutes|
    distinct ticks (82 × 421 here), and (strike, CP) ↔ symbol is injective —
    so the MAX-on-collision dedup is pushed BELOW the encode, grouping on the
    cheap integer keys first, and the expensive scalar work (symbol
    formatting, tz-aware epoch encode) is computed once per DISTINCT key via
    two broadcast dimension joins instead of once per raw row. The same move
    an optimizer makes when an aggregation commutes with an injective
    projection: per-row work drops from O(rows) to O(distinct keys).
    """
    li = load_table(spark, sf_dir, "lineitem")
    strike = (5400 + (F.col("l_partkey") % 41) * 5).cast("int")
    cp = F.when(F.col("l_returnflag") == "R", -1).otherwise(1)
    minute = ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 420).cast("int")
    mark = F.round(F.col("l_extendedprice") / 1000, 2)
    # integer-key dedup straight off the scan: partial aggregation combines
    # map-side, so only |distinct keys| rows cross the exchange
    agg = (
        li.select(
            strike.alias("strike"),
            cp.alias("cp"),
            minute.alias("minute"),
            mark.alias("mark"),
        )
        .groupBy("strike", "cp", "minute")
        .agg(F.max("mark").alias("mark"))
    )
    # dimension: (strike, cp) -> symbol string (82 rows, broadcast)
    sym_dim = (
        spark.range(41)
        .select(
            (5400 + F.col("id") * 5).cast("int").alias("strike"),
            F.explode(F.array(F.lit(1).cast("int"), F.lit(-1).cast("int"))).alias("cp"),
        )
        .select(
            "strike",
            "cp",
            make_option_symbol(
                "SPXW", F.lit(_EXPIRY).cast("date"), F.col("cp"), F.col("strike")
            ).alias("symbol"),
        )
    )
    # dimension: minute -> epoch-ms (420 rows, broadcast)
    min_dim = spark.range(420).select(
        F.col("id").cast("int").alias("minute"),
        F.unix_millis(
            F.to_utc_timestamp(
                F.expr(f"timestamp_ntz'{_DAY} 06:00:00' + make_interval(0,0,0,0,0,id,0)")
                .cast("timestamp"),
                "America/Los_Angeles",
            )
        ).alias("ms"),
    )
    return (
        agg.join(F.broadcast(sym_dim), on=["strike", "cp"])
        .join(F.broadcast(min_dim), on="minute")
        .select(
            F.col("ms").alias("received_at"),
            "symbol",
            F.col("mark").alias("37"),
            F.col("ms").alias("38"),
            F.lit(None).cast("double").alias("3"),
            F.lit(None).cast("long").alias("35"),
        )
    )


def pipeline_verts_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ticks → Silver → Gold, returning the VERT_TS series on natural keys."""
    ticks = _ticks_from_lineitem(spark, sf_dir)

    # ---- Silver (plans.silver.parse_quotes: F2/F4/P3/P4 + guards) ----
    parsed = parse_quotes(ticks)
    n_part = spark.sparkContext.defaultParallelism
    marks = (
        parsed.filter(
            (F.col("T") >= F.lit(f"{_DAY} 06:30:00").cast("timestamp_ntz"))
            & (F.col("T") <= F.lit(_SESSION_END).cast("timestamp_ntz"))
        )
        .repartition(n_part, "Strike", "CP")  # one exchange reused downstream
        .groupBy("Strike", "CP", "Expiry", "T")
        .agg(F.max("Mark").alias("Mark"))  # A7
        .select(
            "Strike", "CP", "Expiry", "T",
            F.col("Mark").cast("decimal(9,2)").cast("double").alias("O"),
        )
    )
    # Diamond DAG below: gapfill reads marks twice (bounds + join) and the
    # pairing reads the densified series twice (short + long leg). Caching the
    # ~contracts×minutes aggregate (small) stops the tick subtree from being
    # recomputed once per branch (SURVEY §4: cache only when reused ≥2×;
    # measured ~12% faster than relying on AQE ReuseExchange here).
    # Lifecycle: these caches are query-scoped and bounded (one session-day of
    # aggregates); the bench/driver releases them via clearCache() after each
    # query. Long-running loops must NOT call this builder repeatedly without
    # that discipline — streaming Gold uses plans.gold.gold_scope instead.
    marks = marks.persist()

    # ---- Gold: T9 densify per leg ----
    # dense feeds both sides of the pairing self-join below — persist so the
    # gapfill (grid explode + LOCF window) runs once, not per branch
    dense = gapfill_locf(
        marks,
        entity=["Strike", "CP", "Expiry"],
        ts="T",
        values=["O"],
        step="interval 1 minute",
        grid_start="date_trunc('minute', _min_ts)",
        grid_end=f"timestamp_ntz'{_DAY} 13:00:00'",
    ).persist()

    # ---- J5 pairing: same (T, CP, Expiry), long leg W strikes away ----
    long_strike = F.when(F.col("CP") == -1, F.col("Strike") - _WIDTH).otherwise(
        F.col("Strike") + _WIDTH
    )
    short = dense.select(
        F.col("Strike").alias("SS"), "CP", "Expiry", "T",
        F.col("O").alias("SO"), long_strike.alias("LSTRIKE"),
    )
    longs = dense.select(
        F.col("Strike").alias("LSTRIKE"), "CP", "Expiry", "T", F.col("O").alias("LO")
    )
    pairs = short.join(longs, on=["LSTRIKE", "CP", "Expiry", "T"], how="inner").select(
        "SS", "CP", "Expiry", "T", (F.col("SO") - F.col("LO")).alias("NET")
    )

    # ---- W1/W2 outlier flag per spread ----
    # materialize the 4 sliding aggregates once (Spark does not CSE
    # duplicate window expressions; see operators/windows.py)
    base = Window.partitionBy("SS", "CP", "Expiry").orderBy("T")
    w_pre, w_fol = base.rowsBetween(-5, -1), base.rowsBetween(1, 5)
    ndec = F.col("NET").cast("decimal(18,6)")
    flagged = pairs.select(
        "SS", "CP", "Expiry", "T", "NET",
        F.sum(ndec).over(w_pre).alias("_sp"), F.count("NET").over(w_pre).alias("_cp"),
        F.sum(ndec).over(w_fol).alias("_sf"), F.count("NET").over(w_fol).alias("_cf"),
    )
    avg_pre = F.col("_sp").cast("double") / F.col("_cp")
    avg_fol = F.col("_sf").cast("double") / F.col("_cf")
    oi = F.when(
        (((avg_pre - F.col("NET")) > 0.5) & ((avg_fol - F.col("NET")) > 0.5))
        | (((F.col("NET") - avg_pre) > 0.5) & ((F.col("NET") - avg_fol) > 0.5)),
        1,
    ).otherwise(0)

    clean = (
        flagged.withColumn("OI", oi)
        .filter(F.col("OI") != 1)  # exclusion, docs/sql_server.md:541-542
        .withColumn("O", clamp(F.col("NET"), 0.0, float(_WIDTH)))  # F10
        .drop("_sp", "_cp", "_sf", "_cf")
    )

    # ---- W3 rolling + A10 final dedup ----
    w_roll = Window.partitionBy("SS", "CP", "Expiry").orderBy("T").rowsBetween(-10, 0)
    rolled = clean.withColumn(
        "AVG_R",
        F.sum(F.col("O").cast("decimal(18,6)")).over(w_roll).cast("double")
        / F.count("O").over(w_roll),
    )
    return rolled.groupBy("SS", "CP", "Expiry", "T").agg(
        F.max("O").alias("O"), F.max("AVG_R").alias("AVG_R")
    )


PIPELINE_SQL = f"""
WITH ticks AS (
  SELECT 5400 + (l_partkey % 41) * 5 AS strike,
         CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END AS cp,
         TIMESTAMP '{_DAY} 06:00:00' + INTERVAL ((l_orderkey * 7 + l_linenumber) % 420) MINUTE AS t,
         ROUND(l_extendedprice / 1000, 2) AS mark
  FROM lineitem
), marks AS (
  SELECT strike, cp, t,
         CAST(CAST(MAX(mark) AS DECIMAL(9,2)) AS DOUBLE) AS o
  FROM ticks
  WHERE t >= TIMESTAMP '{_DAY} 06:30:00' AND t <= TIMESTAMP '{_SESSION_END}'
  GROUP BY strike, cp, t
), bounds AS (
  SELECT strike, cp, date_trunc('minute', MIN(t)) AS mn FROM marks GROUP BY strike, cp
), grid AS (
  SELECT strike, cp, UNNEST(generate_series(mn, TIMESTAMP '{_SESSION_END}', INTERVAL 1 MINUTE)) AS t
  FROM bounds
), dense AS (
  SELECT g.strike, g.cp, g.t,
         LAST_VALUE(m.o IGNORE NULLS) OVER (
           PARTITION BY g.strike, g.cp ORDER BY g.t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o
  FROM grid g LEFT JOIN marks m ON m.strike = g.strike AND m.cp = g.cp AND m.t = g.t
), pairs AS (
  SELECT s.strike AS ss, s.cp, s.t, s.o - l.o AS net
  FROM dense s JOIN dense l
    ON l.cp = s.cp AND l.t = s.t
   AND l.strike = CASE WHEN s.cp = -1 THEN s.strike - {_WIDTH} ELSE s.strike + {_WIDTH} END
), flagged AS (
  SELECT ss, cp, t, net,
    CASE WHEN ((CAST(SUM(CAST(net AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(net) OVER w_pre - net) > 0.5
           AND (CAST(SUM(CAST(net AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(net) OVER w_fol - net) > 0.5)
           OR ((net - CAST(SUM(CAST(net AS DECIMAL(18,6))) OVER w_pre AS DOUBLE) / COUNT(net) OVER w_pre) > 0.5
           AND (net - CAST(SUM(CAST(net AS DECIMAL(18,6))) OVER w_fol AS DOUBLE) / COUNT(net) OVER w_fol) > 0.5)
         THEN 1 ELSE 0 END AS oi
  FROM pairs
  WINDOW
    w_pre AS (PARTITION BY ss, cp ORDER BY t ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING),
    w_fol AS (PARTITION BY ss, cp ORDER BY t ROWS BETWEEN 1 FOLLOWING AND 5 FOLLOWING)
), clean AS (
  SELECT ss, cp, t, LEAST(GREATEST(net, 0.0), {_WIDTH}.0) AS o
  FROM flagged WHERE oi <> 1
), rolled AS (
  SELECT ss, cp, t, o,
    CAST(SUM(CAST(o AS DECIMAL(18,6))) OVER w_roll AS DOUBLE) / COUNT(o) OVER w_roll AS avg_r
  FROM clean
  WINDOW w_roll AS (PARTITION BY ss, cp ORDER BY t ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
)
SELECT ss AS SS, CAST(cp AS SMALLINT) AS CP, DATE '{_EXPIRY}' AS Expiry, t AS T,
       MAX(o) AS O, MAX(avg_r) AS AVG_R
FROM rolled GROUP BY ss, cp, t
"""


SPECS = [
    QuerySpec(
        "pipeline_verts_e2e",
        pipeline_verts_e2e,
        PIPELINE_SQL,
        headline=True,
        doc="FULL flagship pipeline: ticks → Silver (parse/dedup) → Gold (LOCF/pair/outlier/clamp/rolling)",
    ),
]
