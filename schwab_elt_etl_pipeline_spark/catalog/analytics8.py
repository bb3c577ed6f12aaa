"""Round-5 wave: distributed graph triangle counting, interval-overlap
joins, rolling z-score anomaly flags, and winsorized robust statistics.

Each query is a plan shape a 100 TB pipeline needs beyond what the reference
exercises:

- triangle counting is THE join-bounded graph motif — the degree-oriented
  plan keeps the wedge intermediate at O(m^1.5) instead of O(Σ deg²), which
  is the difference between feasible and not on a skewed social graph;
- interval-overlap generalizes the point-in-interval join
  (``operators/interval.py``) to interval×interval with an overlap-length
  measure, via the same day-bucket equi-join blocking;
- rolling z-score is the streaming-shaped anomaly detector (trailing frame,
  exact decimal moments so the score is order-independent);
- winsorization is the robust-statistics twin of the quantile quality gate
  (clamp at exact percentiles, then exact-decimal mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.graph import triangle_counts
from schwab_elt_etl_pipeline_spark.sources import load_table


def _click_edges(ev: DataFrame) -> DataFrame:
    """Canonical undirected co-click edges (u < v), one row per edge.

    Same item graph as ``item_walk_counts`` (item = ``props.k`` of click
    events); the per-user distinct-item fan-out is catalog-bounded, so the
    edge set is |items|²-bounded, not |events|-bounded.
    """
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.from_json("props", "k INT")["k"].alias("item"))
        .distinct()
    )
    other = clicks.select("user_id", F.col("item").alias("v"))
    return (
        clicks.join(other, "user_id")
        .filter(F.col("item") < F.col("v"))
        .select(F.col("item").alias("u"), "v")
        .distinct()
    )


def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts over the co-click graph.

    Degree-oriented algorithm (the MapReduce-classic): orient every edge
    from its (degree, id)-smaller endpoint to the larger one. The oriented
    graph is a DAG where each triangle has exactly one apex with two
    out-edges, so

        triangles = (a→b ⋈ a→c on a)  ⋈  oriented(b→c)

    counts each triangle exactly once. Orientation caps out-degree at
    O(√m), so the wedge intermediate is O(m^1.5) — a plain wedge join on
    un-oriented edges would be O(Σ deg²), quadratic in the hottest vertex.
    Degrees are node-sized → broadcast; the only big shuffles are the wedge
    equi-join on the apex and the closing equi-join on (b, c).
    """
    ev = load_table(spark, sf_dir, "events")
    return triangle_counts(_click_edges(ev))


TRIANGLES_SQL = """
WITH clicks AS (
  SELECT DISTINCT user_id, CAST(props->>'$.k' AS INT) AS item
  FROM events WHERE event_type = 'click'
),
edges AS (
  SELECT DISTINCT a.item AS u, b.item AS v
  FROM clicks a JOIN clicks b USING (user_id)
  WHERE a.item < b.item
),
tri AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT item, COUNT(*) AS n_tri FROM (
  SELECT x AS item FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
) GROUP BY item
"""


def j_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join with an overlap-length measure.

    Left intervals: per-(user, day) activity sessions [first, last] over
    click/view events. Right intervals: 30-minute incident windows opened
    by that user's error events. Pairs where the intervals overlap, with
    the overlap length in exact integer microseconds.

    Plan: the join is an EQUI-join on (user_id, day) — incidents explode
    into the ≤2 calendar days they cover (bounded fan-out), sessions carry
    their single day — with the overlap predicate as a cheap residual.
    A bare ``s_start <= i_end AND i_start <= s_end`` join would plan a
    nested-loop cross product; the oracle states exactly that predicate
    form, proving the blocked plan loses no pairs.
    """
    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("i_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("i_end"),
    )
    inc_days = incidents.withColumn(
        "day",
        F.explode(F.sequence(F.to_date("i_start"), F.to_date("i_end"))),
    )
    joined = sessions.join(inc_days, ["user_id", "day"]).filter(
        (F.col("s_start") <= F.col("i_end"))
        & (F.col("i_start") <= F.col("s_end"))
    )
    return joined.select(
        "user_id",
        "day",
        "incident_id",
        (
            # parquet timestamps load as NTZ; unix_micros needs an instant —
            # the session tz is pinned UTC, so the cast is value-preserving
            F.unix_micros(F.least("s_end", "i_end").cast("timestamp"))
            - F.unix_micros(F.greatest("s_start", "i_start").cast("timestamp"))
        ).alias("overlap_us"),
    )


INTERVAL_OVERLAP_SQL = """
WITH sessions AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         MIN(ts) AS s_start, MAX(ts) AS s_end
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY user_id, CAST(ts AS DATE)
),
incidents AS (
  SELECT user_id, event_id AS incident_id,
         ts AS i_start, ts + INTERVAL 30 MINUTE AS i_end
  FROM events WHERE event_type = 'error'
)
SELECT s.user_id, s.day, i.incident_id,
       CAST(epoch_us(LEAST(s.s_end, i.i_end))
            - epoch_us(GREATEST(s.s_start, i.i_start)) AS BIGINT) AS overlap_us
FROM sessions s JOIN incidents i
  ON s.user_id = i.user_id
 AND s.s_start <= i.i_end AND i.i_start <= s.s_end
"""


def w_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-20-event rolling z-score anomaly flag per user.

    The rolling mean/variance come from exact DECIMAL power sums over the
    frame (sum, sum-of-squares), so the moments are independent of
    evaluation order — the same discipline as ``a_stats_moments`` /
    ``a_ols_trend_exact``, applied to a moving frame. The final score is a
    fixed sequence of IEEE ops on those exact inputs. One window exchange
    on user_id serves every column. Degenerate frames (zero variance)
    yield NULL z and no flag.
    """
    ev = load_table(spark, sf_dir, "events")
    # Sliding decimal sums as PREFIX DIFFERENCES (r13, guide §1.2 per-task
    # work): Spark's sliding row frame re-evaluates its buffer per row
    # (O(frame) decimal updates each), while the running unbounded-preceding
    # frame is maintained incrementally (O(1)) and ``lag`` is a plain offset
    # lookup. sum[-19..0] == P_i - P_(i-20) EXACTLY — decimal +/- is exact
    # integer arithmetic at scale 6/12, so the difference of prefix sums is
    # bit-identical to the frame sum (no float reassociation anywhere). The
    # non-null prefix count reproduces SUM's all-NULL-frame => NULL contract.
    # Both window nodes share one (user_id) exchange and one sort.
    # MAGNITUDE/ROW-COUNT BOUND (r13 advice): unlike the 20-row frame sums,
    # the prefixes accumulate over the WHOLE partition — _p2 is
    # decimal(38,12) (26 integer digits), so exactness requires
    # SUM(value^2) over a user's full history < 1e26: |value| <= 1e6
    # supports 1e14 rows/user, |value| <= 1e9 supports 1e8 rows/user (the
    # bench data is |value| < 1e4). Past the bound, non-ANSI mode NULLs the
    # prefix silently where the sliding form would not — run with
    # spark.sql.ansi.enabled=true to surface overflow as an error instead
    # (pinned in tests/test_prefix_windows.py::test_prefix_overflow_ansi).
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_row = Window.partitionBy("user_id").orderBy("ts", "event_id")
    vdec = F.col("value").cast("decimal(18,6)")
    pre = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(vdec).over(w_run).alias("_p1"),
        F.sum(vdec * vdec).over(w_run).alias("_p2"),
        F.count(vdec).over(w_run).alias("_cnn"),
        F.row_number().over(w_row).alias("_rn"),
    )
    lag1 = F.coalesce(
        F.lag("_p1", 20).over(w_row), F.lit(0).cast("decimal(28,6)")
    )
    lag2 = F.coalesce(
        F.lag("_p2", 20).over(w_row), F.lit(0).cast("decimal(38,12)")
    )
    lagc = F.coalesce(F.lag("_cnn", 20).over(w_row), F.lit(0).cast("long"))
    sized = pre.select(
        "user_id",
        "value",
        "event_id",
        F.when(F.col("_cnn") - lagc > 0, F.col("_p1") - lag1).alias("_s1"),
        F.when(F.col("_cnn") - lagc > 0, F.col("_p2") - lag2).alias("_s2"),
        F.least(F.col("_rn"), F.lit(20)).alias("_n"),
    )
    m = F.col("_s1").cast("double") / F.col("_n")
    var = F.col("_s2").cast("double") / F.col("_n") - m * m
    z = F.when(var > 0, F.round((F.col("value") - m) / F.sqrt(var), 6))
    return sized.select(
        "user_id",
        "event_id",
        "value",
        F.round(m, 6).alias("roll_mean"),
        z.alias("z"),
        F.coalesce(F.abs(z) > 2.5, F.lit(False)).alias("is_outlier"),
    )


ROLLING_ZSCORE_SQL = """
WITH scored AS (
  SELECT user_id, event_id, value,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS m,
         CAST(SUM(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
           / COUNT(*) OVER w AS ex2,
         COUNT(*) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, value,
       ROUND(m, 6) AS roll_mean,
       CASE WHEN ex2 - m * m > 0
            THEN ROUND((value - m) / sqrt(ex2 - m * m), 6) END AS z,
       COALESCE(CASE WHEN ex2 - m * m > 0
                     THEN abs(ROUND((value - m) / sqrt(ex2 - m * m), 6)) > 2.5
                END, FALSE) AS is_outlier
FROM scored
"""


def a_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: clamp at the exact p05/p95, then an
    exact-decimal mean of the clamped values.

    Thresholds are exact interpolated percentiles (one grouped-percentile
    pass, group-count-sized result → broadcast back); clamping and the
    tail counts are a second linear scan. Rounding the thresholds to 6
    digits BEFORE the clamp pins the tie edge identically across engines.
    The robust twin of ``quality_quantile_gate`` (which drops the tail;
    winsorization saturates it).
    """
    ev = load_table(spark, sf_dir, "events")
    th = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(th), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_lo"),
            F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_hi"),
            (
                F.sum(clamped.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("win_mean"),
        )
    )


WINSORIZED_SQL = """
WITH th AS (
  SELECT event_type,
         ROUND(quantile_cont(value, 0.05), 6) AS lo,
         ROUND(quantile_cont(value, 0.95), 6) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, lo, hi,
       COUNT(*) AS n,
       COUNT(*) FILTER (WHERE value < lo) AS n_lo,
       COUNT(*) FILTER (WHERE value > hi) AS n_hi,
       CAST(SUM(CAST(LEAST(GREATEST(value, lo), hi) AS DECIMAL(18,6)))
            AS DOUBLE) / COUNT(*) AS win_mean
FROM events e JOIN th USING (event_type)
GROUP BY e.event_type, lo, hi
"""


def a_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the four lineitem measures in ONE
    scan: every power/cross sum accumulates as exact DECIMAL (so the
    moments are partial-aggregable and order-independent — the same
    discipline as ``a_stats_moments``/``a_ols_trend_exact`` widened to the
    full moment matrix), then each correlation is a fixed IEEE expression
    over the exact sums. At 100 TB: one map-side-combined all-reduce of
    15 numbers; the correlation math runs on one row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    # Asymmetric cast widths, same exact values: Spark uses (18,4) so the
    # product type is (37,8) — full scale 8, exact (a (19,4) operand would
    # make Spark cap precision at 38 by TRUNCATING scale to 7). The DuckDB
    # oracle uses (19,4) because width > 18 is what forces DuckDB onto its
    # wide-decimal multiply path instead of overflowing int64 storage; its
    # product is (38,8). Both engines therefore hold every cross product
    # exactly at scale 8 and the sums agree bit-for-bit.
    dec = {c: F.col(c).cast("decimal(18,4)") for c in cols}
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, a in enumerate(cols):
        aggs.append(F.sum(dec[a]).cast("double").alias(f"s_{i}"))
        for j, b in enumerate(cols):
            if j >= i:
                aggs.append(
                    F.sum(dec[a] * dec[b]).cast("double").alias(f"s_{i}_{j}")
                )
    m = li.agg(*aggs)

    def corr(i: int, j: int) -> F.Column:
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{i}"), F.col(f"s_{j}")
        sxx, syy = F.col(f"s_{i}_{i}"), F.col(f"s_{j}_{j}")
        sxy = F.col(f"s_{i}_{j}")
        return F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(cols[i]).alias("col_a"),
                F.lit(cols[j]).alias("col_b"),
                corr(i, j).alias("corr"),
            )
            for i in range(len(cols))
            for j in range(i + 1, len(cols))
        ]
    )
    return m.select(F.explode(pairs).alias("p")).select(
        "p.col_a", "p.col_b", "p.corr"
    )


def _corr_sql() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    sums = ["COUNT(*) AS n"]
    for i, a in enumerate(cols):
        sums.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(19,4))) AS DOUBLE) AS s_{i}"
        )
        for j, b in enumerate(cols):
            if j >= i:
                sums.append(
                    f"CAST(SUM(CAST({a} AS DECIMAL(19,4))"
                    f" * CAST({b} AS DECIMAL(19,4))) AS DOUBLE) AS s_{i}_{j}"
                )
    def corr(i: int, j: int) -> str:
        return (
            f"ROUND((CAST(n AS DOUBLE) * s_{i}_{j} - s_{i} * s_{j}) / "
            f"(sqrt(CAST(n AS DOUBLE) * s_{i}_{i} - s_{i} * s_{i})"
            f" * sqrt(CAST(n AS DOUBLE) * s_{j}_{j} - s_{j} * s_{j})), 6)"
        )
    rows = " UNION ALL ".join(
        f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, {corr(i, j)} AS corr FROM m"
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    )
    return f"WITH m AS (SELECT {', '.join(sums)} FROM lineitem) {rows}"


A_CORR_SQL = _corr_sql()


def a_chi2_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared contingency cells for event_type × day-of-week: observed
    count, expected count under independence, and the cell's chi² term.

    The raw-data pass is ONE grouped count (map-side combinable); the
    margin/expected math runs as window sums over the |types|×7 cell table
    — constant-sized at any corpus scale, so no second scan and no
    broadcast of data-sized state. Per-cell terms stay rows (no cross-cell
    float summation → order-independent); the scalar statistic is a
    trivial exact consumer of the rounded terms.
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("obs"))
    w_all = Window.partitionBy()
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("dow")
    expected = (
        F.sum("obs").over(w_row).cast("double")
        * F.sum("obs").over(w_col).cast("double")
        / F.sum("obs").over(w_all).cast("double")
    )
    return cells.select(
        "event_type",
        "dow",
        "obs",
        F.round(expected, 6).alias("expected"),
        F.round(
            (F.col("obs") - expected) * (F.col("obs") - expected) / expected, 6
        ).alias("chi2_term"),
    )


A_CHI2_SQL = """
WITH cells AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow, COUNT(*) AS obs
  FROM events GROUP BY event_type, CAST(dayofweek(ts) + 1 AS INT)
), m AS (
  SELECT event_type, dow, obs,
         CAST(SUM(obs) OVER (PARTITION BY event_type) AS DOUBLE)
           * CAST(SUM(obs) OVER (PARTITION BY dow) AS DOUBLE)
           / CAST(SUM(obs) OVER () AS DOUBLE) AS expected
  FROM cells
)
SELECT event_type, dow, obs,
       ROUND(expected, 6) AS expected,
       ROUND((obs - expected) * (obs - expected) / expected, 6) AS chi2_term
FROM m
"""


def a_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-depth histogram of order totals WITHOUT a global
    sort: exact decile boundaries from one grouped-percentile all-reduce
    (1-row scalar, broadcast back), bucket assignment as a counting filter
    over the boundary array, per-bucket count/min/max in a second linear
    scan. The ntile() alternative is a SinglePartition global window — a
    driver-shaped bottleneck at 100 TB; this shape scales (and degrades
    gracefully to approx_percentile boundaries when exactness is waived).
    Ties land in the lower bucket (strict > against each boundary).
    """
    orders = load_table(spark, sf_dir, "orders")
    deciles = [i / 10 for i in range(1, 10)]
    th = orders.agg(
        F.transform(
            F.expr(
                "percentile(o_totalprice, array("
                + ", ".join(str(d) for d in deciles)
                + "))"
            ),
            lambda b: F.round(b, 6),
        ).alias("bs")
    )
    bucketed = orders.crossJoin(F.broadcast(th)).select(
        (
            1
            + F.size(F.filter("bs", lambda b: F.col("o_totalprice") > b))
        ).alias("bucket"),
        "o_totalprice",
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


A_EQUIDEPTH_SQL = """
WITH th AS (
  SELECT list_transform(
           quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           b -> ROUND(b, 6)) AS bs
  FROM orders
)
SELECT 1 + LEN(list_filter(bs, b -> o_totalprice > b)) AS bucket,
       COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM orders, th
GROUP BY 1
"""


def dq_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-drift monitor: flag (event_type, day) cells whose daily row
    count deviates from that type's median by more than 3 robust sigmas
    (MAD-based — a few bad days cannot drag the baseline the way a mean/
    stddev gate would).

    The raw scan collapses to a |types|×|days| count table in one grouped
    pass; medians and MADs are exact percentiles over that TINY table, so
    the two extra aggregation stages cost nothing at any corpus scale, and
    the thresholds broadcast back. This is the ingest-monitoring twin of
    ``dq_expectations_orders`` (row-level rules) at the volume level.
    """
    from schwab_elt_etl_pipeline_spark.operators.quality import mad_drift

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return mad_drift(daily, ["event_type"], k=3.0)


DQ_VOLUME_DRIFT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY event_type
), mad AS (
  SELECT d.event_type, quantile_cont(abs(d.n - m.med), 0.5) AS mad
  FROM daily d JOIN med m USING (event_type) GROUP BY d.event_type
)
SELECT d.event_type, d.day, d.n,
       ROUND(m.med, 6) AS med, ROUND(a.mad, 6) AS mad,
       (a.mad > 0 AND abs(d.n - m.med) > 3 * a.mad) AS is_drift
FROM daily d JOIN med m USING (event_type) JOIN mad a ON a.event_type = d.event_type
"""


def j_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the user's most recent
    click at or before the purchase and within a 7-day lookback (NULL when
    unattributed).

    The join key is user_id — per-user event fan-out is bounded, so this is
    a co-partitioned equi-join with the time band as residual, then one
    max_by per purchase (deterministic: ts then event_id ordering packed
    into a struct max). The same plan is the backward as-of join; the
    catalog's ``t_asof_enrich`` covers the union+LOCF formulation, this one
    the banded-join formulation that also carries the attribution gap.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    # the time band belongs IN the join condition: filtering after a left
    # join would delete purchases whose clicks are all out-of-window instead
    # of keeping them unattributed (NULL-extended)
    joined = purchases.join(
        clicks,
        (purchases["user_id"] == clicks["user_id"])
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    ).select(
        "purchase_id", purchases["user_id"].alias("user_id"), "p_ts",
        "click_id", "c_ts",
    )
    best = F.max(F.struct("c_ts", "click_id"))
    return (
        joined.groupBy("purchase_id", "user_id", "p_ts")
        .agg(best.alias("b"))
        .select(
            "purchase_id",
            "user_id",
            F.col("b.click_id").alias("click_id"),
            (
                F.unix_micros(F.col("p_ts").cast("timestamp"))
                - F.unix_micros(F.col("b.c_ts").cast("timestamp"))
            ).alias("gap_us"),
        )
    )


ATTRIBUTION_SQL = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, event_id AS click_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
), joined AS (
  SELECT p.purchase_id, p.user_id, p.p_ts, c.click_id, c.c_ts,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.c_ts DESC, c.click_id DESC) AS rk
  FROM purchases p LEFT JOIN clicks c
    ON c.user_id = p.user_id
   AND c.c_ts <= p.p_ts AND c.c_ts >= p.p_ts - INTERVAL 7 DAY
)
SELECT purchase_id, user_id, click_id,
       CAST(epoch_us(p_ts) - epoch_us(c_ts) AS BIGINT) AS gap_us
FROM joined WHERE rk = 1
"""


SPECS = [
    QuerySpec(
        "graph_triangle_counts", graph_triangle_counts, TRIANGLES_SQL,
        headline=True,
        doc="per-vertex triangle counts, degree-oriented O(m^1.5) wedge join",
    ),
    QuerySpec(
        "j_interval_overlap", j_interval_overlap, INTERVAL_OVERLAP_SQL,
        doc="interval-overlap join via day-bucket blocking + residual",
    ),
    QuerySpec(
        "w_rolling_zscore", w_rolling_zscore, ROLLING_ZSCORE_SQL,
        headline=True,
        doc="trailing-frame z-score anomaly flags from exact decimal moments",
    ),
    QuerySpec(
        "a_winsorized_stats", a_winsorized_stats, WINSORIZED_SQL,
        doc="winsorized robust mean at exact p05/p95 clamp",
    ),
    QuerySpec(
        "a_corr_matrix", a_corr_matrix, A_CORR_SQL,
        doc="pairwise Pearson correlations from one exact-moment scan",
    ),
    QuerySpec(
        "a_chi2_contingency", a_chi2_contingency, A_CHI2_SQL,
        doc="chi-squared contingency cells (margins via cell-table windows)",
    ),
    QuerySpec(
        "a_equidepth_hist", a_equidepth_hist, A_EQUIDEPTH_SQL,
        doc="equi-depth histogram via percentile boundaries, no global sort",
    ),
    QuerySpec(
        "dq_volume_drift", dq_volume_drift, DQ_VOLUME_DRIFT_SQL,
        doc="MAD-based daily volume drift monitor per event type",
    ),
    QuerySpec(
        "j_attribution_last_touch", j_attribution_last_touch, ATTRIBUTION_SQL,
        doc="last-touch attribution: backward banded as-of join + max_by",
    ),
]
