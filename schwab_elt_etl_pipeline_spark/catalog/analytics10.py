"""Round-6 wave: global-order analytics without single-partition plans.

Every query here exercises the distributed prefix scan
(``operators/prefix.py``) or the interpolation gap-fill
(``operators/gapfill.py``): the operator family the reference writes as
T-SQL ``... OVER (ORDER BY ...)`` running scans (docs/sql_server.md
running-total idioms) and its timeseries backfill proc
(docs/sql_server.md:443-450). A naive Spark translation of any of these is a
``SinglePartition`` window — the canonical 100 TB serialization bug — so the
DuckDB oracles here state exactly that naive global-window SQL, and the hash
match proves the two-phase scan computes the identical answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_interpolate
from schwab_elt_etl_pipeline_spark.operators.prefix import prefix_agg
from schwab_elt_etl_pipeline_spark.operators.recurrence import linear_recurrence
from schwab_elt_etl_pipeline_spark.operators.smooth import ewma
from schwab_elt_etl_pipeline_spark.sources import load_table


# --------------------------------------------------------------------------
# Global running total — the reference's running-balance idiom, two-phase.
# --------------------------------------------------------------------------
def w_running_total_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative Q1-1995 order revenue in global orderkey order.

    The oracle is the textbook ``SUM() OVER (ORDER BY ...)`` with no
    PARTITION BY; the engine answers it with the Blelloch two-phase scan —
    range shuffle + per-partition window + bounded offset broadcast — so the
    data never passes through one task. Exact decimal partials, one final
    cast to double.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1995-03-31")
    )
    base = orders.select(
        "o_orderkey", F.col("o_totalprice").cast("decimal(18,4)").alias("_p")
    )
    out = prefix_agg(base, ["o_orderkey"], "_p", "_run", how="sum")
    return out.select(
        "o_orderkey",
        F.col("_p").cast("double").alias("price"),
        F.col("_run").cast("double").alias("running_total"),
    )


W_RUNNING_TOTAL_SQL = """
SELECT o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            ORDER BY o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-03-31'
"""


# --------------------------------------------------------------------------
# Pareto frontier (skyline): min price / max size over part.
# --------------------------------------------------------------------------
def p_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of distinct (price, size) points: cheapest-for-their-capacity
    parts — no other part is both no-more-expensive and no-smaller with one
    strict.

    2-D skyline reduces to a sweep: keep a point iff it is the max size at
    its price AND strictly beats the running max size over all cheaper
    prices. The per-price max is an ordinary groupBy; the running max over
    the price order is the EXCLUSIVE distributed prefix scan — so the sweep
    that single-node engines do with one sorted pass runs partition-parallel
    here (local skylines + bounded boundary merge, the classic distributed
    skyline decomposition).
    """
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).distinct()
    per_price = pts.groupBy("price").agg(F.max("size").alias("size"))
    swept = prefix_agg(
        per_price, ["price"], "size", "_prior", how="max", inclusive=False
    )
    frontier = swept.filter(
        F.col("_prior").isNull() | (F.col("size") > F.col("_prior"))
    )
    return frontier.select(F.col("price").cast("double").alias("price"), "size")


P_SKYLINE_SQL = """
WITH pts AS (SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part),
per_price AS (SELECT price, MAX(size) AS size FROM pts GROUP BY price),
swept AS (
  SELECT price, size,
         MAX(size) OVER (ORDER BY price
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior
  FROM per_price)
SELECT CAST(price AS DOUBLE) AS price, size
FROM swept WHERE prior IS NULL OR size > prior
"""


# --------------------------------------------------------------------------
# Weighted systematic sampling — exact-k, integer-exact, fully distributed.
# --------------------------------------------------------------------------
_SAMPLE_K = 100


def sample_weighted_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~k orders sampled with probability proportional to total price.

    Deterministic systematic (cumulative-weight stride) sampling: walk the
    orderkey-ordered cumulative weight line and take one row per stride
    ``T = total/k`` — the standard PPS scheme, and the one whose selection
    set is EXACTLY reproducible in integer arithmetic (weights in cents, so
    no float threshold can disagree between engines). Both the per-row
    cumulative weight and the grand total come out of one prefix-scan pass
    (``total_out=`` rides the same bounded broadcast — no 1-row crossJoin,
    no BNLJ). A row is selected iff its weight interval crosses a stride
    boundary: ``cum div T > (cum - w) div T``.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderkey", (F.col("o_totalprice") * 100).cast("long").alias("_wc")
    )
    c = prefix_agg(
        w, ["o_orderkey"], "_wc", "_cum", how="sum", total_out="_grand"
    )
    c = c.withColumn(
        "_t", F.greatest(F.expr(f"_grand div {_SAMPLE_K}"), F.lit(1).cast("long"))
    )
    picked = c.filter(F.expr("_cum div _t > (_cum - _wc) div _t"))
    return picked.select(
        "o_orderkey", F.expr("_cum div _t").alias("bucket")
    )


SAMPLE_WEIGHTED_SQL = f"""
WITH w AS (
  SELECT o_orderkey, CAST(o_totalprice * 100 AS BIGINT) AS wc FROM orders),
c AS (
  SELECT o_orderkey, wc,
         CAST(SUM(wc) OVER (ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum,
         CAST(SUM(wc) OVER () AS BIGINT) AS grand FROM w),
p AS (
  SELECT o_orderkey, wc, cum,
         GREATEST(grand // {_SAMPLE_K}, 1) AS t FROM c)
SELECT o_orderkey, cum // t AS bucket
FROM p WHERE cum // t > (cum - wc) // t
"""


# --------------------------------------------------------------------------
# T9b: linear-interpolation gap fill (LOCF's sibling).
# --------------------------------------------------------------------------
def t_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user value series, gaps filled by linear interpolation.

    Same grid machinery as ``t9_gapfill_locf`` (shared ``_grid_union``);
    the fill bracketes each grid point between its neighbouring non-NULL
    observations and lerps on whole-second elapsed/span — an exact integer
    ratio, so the IEEE multiply-add matches the oracle bit-for-bit.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.withColumn("h", F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz"))
        .groupBy("user_id", "h")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
    )
    return gapfill_interpolate(
        hourly, entity=["user_id"], ts="h", values=["value"], step="interval 1 hour"
    )


T_INTERP_SQL = """
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
  SELECT user_id, UNNEST(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
  FROM bounds
), unioned AS (
  SELECT user_id, h, 0 AS is_grid, value,
         CASE WHEN value IS NOT NULL THEN h END AS obs_ts
  FROM hourly
  UNION ALL
  SELECT user_id, h, 1, NULL, NULL FROM grid
), marked AS (
  SELECT user_id, h, is_grid,
         LAST_VALUE(obs_ts IGNORE NULLS) OVER wb AS pt,
         LAST_VALUE(value IGNORE NULLS) OVER wb AS pv,
         FIRST_VALUE(obs_ts IGNORE NULLS) OVER wf AS nt,
         FIRST_VALUE(value IGNORE NULLS) OVER wf AS nv
  FROM unioned
  WINDOW wb AS (PARTITION BY user_id ORDER BY h, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY h, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, h,
       CASE WHEN pt IS NULL THEN nv
            WHEN nt IS NULL THEN pv
            ELSE pv + (nv - pv) * (date_diff('second', pt, h)
                                   / date_diff('second', pt, nt))
       END AS value
FROM marked WHERE is_grid = 1
"""


# --------------------------------------------------------------------------
# EWMA smoothing — the recursive sibling of the W1-W3 moving-average family.
# --------------------------------------------------------------------------
def w_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha=0.2) of event values in (ts, event_id) order.

    The oracle states the closed form ``y_t = d^(t-1) x_1 + a*SUM d^(t-i)
    x_i`` directly — safe in DuckDB only because the fixture's per-user
    series are short (<=99 rows, so ``POWER(0.8, -rn)`` stays ~1e9). The
    engine answers with the chunked-exponent scan (``operators/smooth.py``):
    ``chunk_rows=16`` forces up to 7 per-user chunks through the affine
    carry fold, so the hash match certifies the fold against the closed
    form, not just the single-chunk fast path. Output rounds to 4 digits:
    the two evaluation orders differ by ~1 ulp per step and 6-digit
    rounding would flip a boundary row every few thousand rows.
    """
    ev = load_table(spark, sf_dir, "events")
    out = ewma(
        ev, "value", ["user_id"], ["ts", "event_id"], alpha=0.2, chunk_rows=16
    )
    return out.select(
        "user_id",
        "event_id",
        "value",
        F.round("ewma", 4).alias("ewma_val"),
    )


W_EWMA_SQL = """
WITH r AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS rn
  FROM events
)
SELECT user_id, event_id, value,
       ROUND(POWER(0.8, rn) * SUM(
          (CASE WHEN rn = 0 THEN value ELSE 0.2 * value END)
          * POWER(0.8, -rn)
       ) OVER (PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       4) AS ewma_val
FROM r
"""


# --------------------------------------------------------------------------
# EW volatility — the diagonal case of the linear-recurrence scan.
# --------------------------------------------------------------------------
def w_ew_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RiskMetrics EW mean + EW std (lambda=0.8) per user.

    One ``linear_recurrence`` pass carries EWMA(x) and EWMA(x^2) jointly
    (diagonal A — the state components never mix), then
    ``std = sqrt(m2 - m1^2)``. The oracle states the scalar closed form
    twice; ``chunk_rows=16`` again forces the multi-chunk carry fold. This
    certifies the matrix scan degenerates exactly to two independent EWMAs.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "_x2", F.col("value") * F.col("value")
    )
    out = linear_recurrence(
        ev,
        ["value", "_x2"],
        ["user_id"],
        ["ts", "event_id"],
        A=[[0.8, 0.0], [0.0, 0.8]],
        B=[[0.2, 0.0], [0.0, 0.2]],
        init=[[1.0, 0.0], [0.0, 1.0]],
        outs=["_m1", "_m2"],
        chunk_rows=16,
    )
    return out.select(
        "user_id",
        "event_id",
        "value",
        F.round("_m1", 4).alias("ew_mean"),
        F.round(
            F.sqrt(F.greatest(F.col("_m2") - F.col("_m1") * F.col("_m1"), F.lit(0.0))),
            4,
        ).alias("ew_std"),
    )


W_EWVOL_SQL = """
WITH r AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS rn
  FROM events
), m AS (
  SELECT user_id, event_id, value,
         POWER(0.8, rn) * SUM(
            (CASE WHEN rn = 0 THEN value ELSE 0.2 * value END)
            * POWER(0.8, -rn)
         ) OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m1,
         POWER(0.8, rn) * SUM(
            (CASE WHEN rn = 0 THEN value*value ELSE 0.2 * value*value END)
            * POWER(0.8, -rn)
         ) OVER (PARTITION BY user_id ORDER BY rn
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m2
  FROM r
)
SELECT user_id, event_id, value,
       ROUND(m1, 4) AS ew_mean,
       ROUND(SQRT(GREATEST(m2 - m1*m1, 0)), 4) AS ew_std
FROM m
"""


# --------------------------------------------------------------------------
# Holt level+trend — the full-matrix (complex-eigenvalue) case.
# --------------------------------------------------------------------------
def w_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (alpha=0.4, beta=0.3) per user.

    The 2-state recurrence ``l_t = a*x + (1-a)(l+b); b_t = B(l_t - l_(t-1))
    + (1-B) b_t-1`` in matrix form: A = [[0.6, 0.6], [-0.12, 0.88]]
    (complex eigenvalues, |lambda| = sqrt(0.6)), B = [0.4, 0.12], seed
    (x_1, 0). SQL cannot state a closed form here, so the oracle IS the
    recurrence — a DuckDB recursive CTE stepping rn by rn — and the hash
    match proves the chunked matrix-power scan equals sequential execution.
    """
    ev = load_table(spark, sf_dir, "events")
    out = linear_recurrence(
        ev,
        ["value"],
        ["user_id"],
        ["ts", "event_id"],
        A=[[0.6, 0.6], [-0.12, 0.88]],
        B=[[0.4], [0.12]],
        init=[[1.0], [0.0]],
        outs=["_l", "_b"],
        chunk_rows=16,
    )
    # "+ 0.0" after ROUND canonicalizes IEEE negative zero (a tiny negative
    # trend rounds to -0.0 in one engine and 0.0 in the other at sf0.1)
    return out.select(
        "user_id",
        "event_id",
        "value",
        (F.round("_l", 4) + F.lit(0.0)).alias("lvl"),
        (F.round("_b", 4) + F.lit(0.0)).alias("trend"),
        (F.round(F.col("_l") + F.col("_b"), 4) + F.lit(0.0)).alias("fcast"),
    )


W_HOLT_SQL = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS rn
  FROM events
), r AS (
  SELECT user_id, event_id, value, rn,
         1.0 * COALESCE(value, 0) AS l, CAST(0 AS DOUBLE) AS b
  FROM base WHERE rn = 0
  UNION ALL
  SELECT base.user_id, base.event_id, base.value, base.rn,
         0.6 * r.l + 0.6 * r.b + 0.4 * COALESCE(base.value, 0) AS l,
         -0.12 * r.l + 0.88 * r.b + 0.12 * COALESCE(base.value, 0) AS b
  FROM r JOIN base ON base.user_id = r.user_id AND base.rn = r.rn + 1
)
SELECT user_id, event_id, value,
       ROUND(l, 4) + 0.0 AS lvl, ROUND(b, 4) + 0.0 AS trend,
       ROUND(l + b, 4) + 0.0 AS fcast
FROM r
"""


# --------------------------------------------------------------------------
# CUSUM change detection — a NONLINEAR recurrence via the prefix identity.
# --------------------------------------------------------------------------
def w_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper CUSUM (target 75 ~ mean+0.5 sigma, threshold 200 ~ 4 sigma) per user.

    ``S_t = max(0, S_(t-1) + z_t)`` has a max() in the recurrence, so the
    linear-recurrence scan doesn't apply — but the reset-at-zero clamp has
    an exact prefix identity: ``S_t = P_t - min(0, min_(i<=t) P_i)`` where
    ``P`` is the running sum of ``z``. Two native window scans on the same
    entity exchange, no recursion anywhere. Exact decimal partials make the
    running sum and min order-independent, so the oracle matches without
    rounding slack.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    z = F.col("value").cast("decimal(18,6)") - F.lit(75)
    run = ev.select(
        "user_id", "event_id", "ts", "value", F.sum(z).over(w).alias("_p")
    )
    s = F.col("_p") - F.least(
        F.lit(0).cast("decimal(28,6)"), F.min("_p").over(w)
    )
    return run.select(
        "user_id",
        "event_id",
        "value",
        s.cast("double").alias("cusum"),
        (s > 200).cast("int").alias("alarm"),
    )


W_CUSUM_SQL = """
WITH p AS (
  SELECT user_id, event_id, ts, value,
         SUM(CAST(value AS DECIMAL(18,6)) - 75) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM events
), m AS (
  SELECT user_id, event_id, value, run,
         MIN(run) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lo
  FROM p
), s AS (
  -- CASE, not LEAST: DuckDB's LEAST promotes DECIMAL args to DOUBLE,
  -- which would reintroduce the fp drift the decimals exist to avoid
  SELECT user_id, event_id, value,
         run - (CASE WHEN lo < 0 THEN lo ELSE CAST(0 AS DECIMAL(38,6)) END)
           AS cusum
  FROM m
)
SELECT user_id, event_id, value,
       CAST(cusum AS DOUBLE) AS cusum,
       CAST(cusum > 200 AS INT) AS alarm
FROM s
"""


# --------------------------------------------------------------------------
# Max drawdown — running peak minus current, maximized per entity.
# --------------------------------------------------------------------------
def w_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst peak-to-trough decline of each user's cumulative value line.

    ``D_t = max_(i<=t) P_i - P_t`` (running max over the same prefix-sum
    line CUSUM uses), aggregated to one row per user. Exact decimals end
    to end; the double cast happens once at the output boundary.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).alias("_p"),
    )
    dd = F.max("_p").over(w) - F.col("_p")
    return (
        run.select("user_id", dd.alias("_dd"))
        .groupBy("user_id")
        .agg(F.max("_dd").cast("double").alias("max_drawdown"))
    )


W_DRAWDOWN_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id,
         SUM(CAST(value AS DECIMAL(18,6))) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
  FROM events
), d AS (
  SELECT user_id,
         MAX(run) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
         run
  FROM p
)
SELECT user_id, CAST(MAX(peak - run) AS DOUBLE) AS max_drawdown
FROM d GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Rolling median + MAD outlier flag — the robust-smoothing sibling.
# --------------------------------------------------------------------------
def w_rolling_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """21-row rolling median per user, outliers flagged at 5 robust sigmas.

    The robust counterpart of the EWMA/Holt family: a rolling exact median
    (order statistics cannot be EW-smoothed) for the local level, scaled by
    the per-user global MAD (two grouped medians + a broadcast join-back —
    the `a_mad_robust` shape). The flag compares against ROUNDED med/MAD on
    both sides so a 1-ulp interpolation difference between engines cannot
    flip a boundary row.
    """
    ev = load_table(spark, sf_dir, "events")
    med_u = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("_med_u")
    )
    mad_u = (
        ev.join(F.broadcast(med_u), "user_id")
        .withColumn("_dev", F.abs(F.col("value") - F.col("_med_u")))
        .groupBy("user_id")
        .agg(F.round(F.expr("percentile(_dev, 0.5)"), 4).alias("_mad"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, 10)
    )
    rolled = ev.withColumn(
        "_roll", F.round(F.expr("percentile(value, 0.5)").over(w), 4)
    )
    return (
        rolled.join(F.broadcast(mad_u), "user_id")
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("_roll").alias("roll_med"),
            (
                F.abs(F.col("value") - F.col("_roll")) > 5 * F.col("_mad")
            ).cast("int").alias("is_outlier"),
        )
    )


W_ROLLMED_SQL = """
WITH med AS (
  SELECT user_id, MEDIAN(value) AS med_u FROM events GROUP BY user_id
), mad AS (
  SELECT e.user_id, ROUND(MEDIAN(ABS(e.value - m.med_u)), 4) AS mad_u
  FROM events e JOIN med m ON e.user_id = m.user_id
  GROUP BY e.user_id
), rolled AS (
  SELECT user_id, event_id, value,
         ROUND(MEDIAN(value) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 10 PRECEDING AND 10 FOLLOWING), 4) AS roll_med
  FROM events
)
SELECT r.user_id, r.event_id, r.value, r.roll_med,
       CAST(ABS(r.value - r.roll_med) > 5 * m.mad_u AS INT) AS is_outlier
FROM rolled r JOIN mad m ON r.user_id = m.user_id
"""


# --------------------------------------------------------------------------
# Seasonal baseline residuals — the calendar leg of the anomaly toolkit.
# --------------------------------------------------------------------------
def t_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal median baseline per event type, 4-MAD flags.

    The seasonal sibling of w_rolling_median_mad / w_cusum_shift: the
    baseline is the exact median per (event_type, hour-of-day) cell — a
    bounded table (types x 24) that broadcasts — and the scale is the MAD
    of residuals in the same cell. Rounded baseline/MAD feed the flag on
    both sides so interpolation ulps can't flip a boundary row.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "hod", F.hour("ts")
    )
    base = ev.groupBy("event_type", "hod").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("baseline")
    )
    dev = ev.join(F.broadcast(base), ["event_type", "hod"]).withColumn(
        "resid", F.col("value") - F.col("baseline")
    )
    mad = dev.groupBy("event_type", "hod").agg(
        F.round(F.expr("percentile(abs(resid), 0.5)"), 4).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), ["event_type", "hod"])
        .select(
            "event_id",
            "event_type",
            "hod",
            "value",
            "baseline",
            F.round("resid", 4).alias("resid"),
            (F.abs(F.col("resid")) > 4 * F.col("mad")).cast("int").alias("is_anom"),
        )
    )


T_SEASONAL_SQL = """
WITH e AS (
  SELECT event_id, event_type, EXTRACT(hour FROM ts) AS hod, value FROM events
), base AS (
  SELECT event_type, hod, ROUND(MEDIAN(value), 4) AS baseline
  FROM e GROUP BY event_type, hod
), dev AS (
  SELECT e.event_id, e.event_type, e.hod, e.value, b.baseline,
         e.value - b.baseline AS resid
  FROM e JOIN base b ON e.event_type = b.event_type AND e.hod = b.hod
), mad AS (
  SELECT event_type, hod, ROUND(MEDIAN(ABS(resid)), 4) AS mad
  FROM dev GROUP BY event_type, hod
)
SELECT d.event_id, d.event_type, CAST(d.hod AS INT) AS hod, d.value,
       d.baseline, ROUND(d.resid, 4) AS resid,
       CAST(ABS(d.resid) > 4 * m.mad AS INT) AS is_anom
FROM dev d JOIN mad m ON d.event_type = m.event_type AND d.hod = m.hod
"""


SPECS = [
    QuerySpec(
        "w_ewma_smooth", w_ewma_smooth, W_EWMA_SQL,
        doc="exact EWMA recurrence via chunked-exponent native window scan",
    ),
    QuerySpec(
        "t_seasonal_residuals", t_seasonal_residuals, T_SEASONAL_SQL,
        doc="hour-of-day median baseline + MAD anomaly flags per event type",
    ),
    QuerySpec(
        "w_rolling_median_mad", w_rolling_median_mad, W_ROLLMED_SQL,
        doc="rolling exact median + per-user MAD outlier flags",
    ),
    QuerySpec(
        "w_cusum_shift", w_cusum_shift, W_CUSUM_SQL,
        doc="CUSUM clamp recurrence via the exact prefix-min identity",
    ),
    QuerySpec(
        "w_max_drawdown", w_max_drawdown, W_DRAWDOWN_SQL,
        doc="per-user max drawdown from exact decimal prefix sums",
    ),
    QuerySpec(
        "w_ew_volatility", w_ew_volatility, W_EWVOL_SQL,
        doc="EW mean+std via one diagonal linear-recurrence pass",
    ),
    QuerySpec(
        "w_holt_trend", w_holt_trend, W_HOLT_SQL, headline=True,
        doc="Holt level+trend matrix scan vs sequential recursive-CTE oracle",
    ),
    QuerySpec(
        "w_running_total_global", w_running_total_global, W_RUNNING_TOTAL_SQL,
        doc="global running total via distributed prefix scan",
    ),
    QuerySpec(
        "p_skyline_pareto", p_skyline_pareto, P_SKYLINE_SQL,
        doc="Pareto skyline (min price / max size) via exclusive prefix max",
    ),
    QuerySpec(
        "sample_weighted_systematic", sample_weighted_systematic,
        SAMPLE_WEIGHTED_SQL, headline=True,
        doc="exact-k PPS systematic sample on the cumulative-weight line",
    ),
    QuerySpec(
        "t_interp_linear", t_interp_linear, T_INTERP_SQL, headline=True,
        doc="T9b grid + linear interpolation gapfill",
    ),
]
