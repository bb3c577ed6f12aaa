"""Analytics wave 5: robust statistics + weighted aggregates.

- ``a_mad_robust`` — median absolute deviation per group: the robust-outlier
  scale statistic (the Gold layer's ±0.5 outlier threshold is an absolute
  band, docs/sql_server.md:484-489; MAD is how the same exclusion is done
  when the scale varies by group). Two grouped exact medians with a
  broadcast join-back between them.
- ``t_vwap_weighted`` — weighted average over a JSON-carried weight: VWAP
  per (event_type, hour) with the weight parsed from the ``props`` JSON
  column (F16 JSON surface in an aggregation path). Exact decimal
  numerator/denominator, one division at output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.sources import load_table


def a_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type median + MAD of ``value`` (exact medians: Spark's
    sort-based ``percentile``, matching DuckDB's ``median`` on continuous
    interpolation)."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    return dev.groupBy("event_type").agg(
        F.first("med").alias("median_value"),
        F.expr("percentile(adev, 0.5)").alias("mad"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type",
        F.round("median_value", 6).alias("median_value"),
        F.round("mad", 6).alias("mad"),
        "n",
    )


A_MAD_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
)
SELECT e.event_type,
       ROUND(ANY_VALUE(m.med), 6) AS median_value,
       ROUND(median(ABS(e.value - m.med)), 6) AS mad,
       COUNT(*) AS n
FROM events e JOIN med m USING (event_type)
GROUP BY e.event_type
"""


def t_vwap_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-averaged value per (event_type, hour), weight = ``props.k``
    (JSON column → typed weight inside the aggregation). Numerator and
    denominator stay exact DECIMAL; the output is one deterministic
    division."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("decimal(18,6)")
    v = F.col("value").cast("decimal(18,6)")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(v * k).alias("_num"),
            F.sum(k).alias("_den"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "h",
            # explicit NULL on zero total weight (ANSI division would error;
            # engines disagree on double x/0 — NULL is the defined semantic)
            F.when(
                F.col("_den") != 0,
                F.col("_num").cast("double") / F.col("_den").cast("double"),
            ).alias("vwap"),
            F.col("_den").cast("double").alias("total_weight"),
            "n",
        )
    )


T_VWAP_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS h,
       CASE WHEN SUM(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6))) <> 0
            THEN CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6))) AS DOUBLE)
       END AS vwap,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6))) AS DOUBLE) AS total_weight,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


_BINS = 20


def a_histogram_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event_type: global min/max in one
    tiny pass (broadcast back), then a binned count — the two-pass shape of
    every distributed histogram/quantile-sketch build. Bin ids clamp the
    max value into the last bin."""
    ev = load_table(spark, sf_dir, "events")
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    j = ev.join(F.broadcast(rng), "event_type")
    bin_id = F.least(
        F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / _BINS)),
        F.lit(_BINS - 1),
    ).cast("int")
    return (
        j.select("event_type", bin_id.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


A_HISTOGRAM_SQL = f"""
WITH rng AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(LEAST(FLOOR((e.value - r.lo) / ((r.hi - r.lo) / {_BINS})), {_BINS - 1}) AS INT) AS bin,
       COUNT(*) AS n
FROM events e JOIN rng r USING (event_type)
GROUP BY 1, 2
"""


def a_hll_partitioned_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-counting, certified at verdict level.

    Per-(event_type, day) HLL sketches (Apache DataSketches, lgK=12 →
    rsd ≈ 1.6%) UNION-merged to a per-type distinct-user estimate — THE
    incremental pattern for distinct metrics at 100 TB: daily partitions
    each keep a kilobyte sketch; any rollup (weekly, global, ad-hoc window)
    is a cheap sketch union, raw data is never rescanned.

    Sketch internals are engine-specific, so the emitted row is the
    SQL-expressible certificate: exact distinct users + daily-partition
    count (anchors the partitioned-merge semantics) and a verdict that the
    merged estimate landed within 8% (5σ) of exact."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.expr("hll_sketch_agg(user_id, 12)").alias("sk"),
        F.countDistinct("user_id").alias("_daily_exact"),
    )
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("_approx"),
        F.count(F.lit(1)).alias("n_daily_sketches"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        exact.join(merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_daily_sketches",
            (F.abs(F.col("_approx") - F.col("exact_users"))
             <= 0.08 * F.col("exact_users")).alias("within_tol"),
        )
    )


A_HLL_MERGE_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_daily_sketches,
       TRUE AS within_tol
FROM events GROUP BY event_type
"""


# Heavy-hitter certification parameters. Threshold freq ≥ total/200 (0.5%)
# against a frequent-items sketch tracking 65536 counters: the sketch's
# additive error is ≤ ~3.5/65536 · N ≈ 5e-5 · N, two orders below the
# threshold, so (a) every true-heavy token is guaranteed inside the sketch
# top-256 (≤ ~205 tokens can sit above threshold − 2ε) and (b) its estimate
# sits within 0.05% · N of exact. Both are emitted as verdicts.
_HH_DEN = 200
_HH_K = 256


def a_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched heavy hitters, certified at verdict level.

    ``approx_top_k`` over corpus tokens is the bounded-memory path for
    frequent-item mining (vs token_vocab_topk's exact shuffle). The emitted
    rows are the exact heavy hitters (freq ≥ 0.5% of all tokens — exact
    counts anchor tokenization + thresholding to the oracle) with verdicts
    that the sketch (a) surfaced the token in its top-256 and (b) estimated
    its count within 0.05% · N (the sketch's own error bound at 65536
    tracked counters; see module constants)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_freq"))
    tot = freq.agg(F.sum("exact_freq").alias("_total"))
    heavy = (
        freq.join(F.broadcast(tot))
        .filter(F.col("exact_freq") * _HH_DEN >= F.col("_total"))
    )
    sketch = (
        toks.agg(F.expr(f"approx_top_k(token, {_HH_K}, 65536)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("token"), F.col("e.count").alias("_est"))
    )
    return (
        heavy.join(F.broadcast(sketch), "token", "left")
        .select(
            "token",
            "exact_freq",
            F.col("_est").isNotNull().alias("in_sketch_topk"),
            (F.abs(F.coalesce(F.col("_est"), F.lit(0)) - F.col("exact_freq")) * 2000
             <= F.col("_total")).alias("est_within_tol"),
        )
    )


A_HEAVY_HITTERS_SQL = rf"""
WITH toks AS (
  SELECT UNNEST(string_split_regex(TRIM(LOWER(text)), '\s+')) AS token FROM documents
), freq AS (
  SELECT token, COUNT(*) AS exact_freq FROM toks GROUP BY token
), tot AS (
  SELECT SUM(exact_freq) AS total FROM freq
)
SELECT token, exact_freq, TRUE AS in_sketch_topk, TRUE AS est_within_tol
FROM freq, tot WHERE exact_freq * {_HH_DEN} >= total
"""


def a_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra across segments, certified at verdict level:
    for every event-type pair, the approximate DISTINCT-USER INTERSECTION
    and DIFFERENCE (Apache DataSketches theta, lgK=14) against the exact
    answers.

    This is the audience-overlap query ("how many users did BOTH X and Y")
    that plain HLL cannot answer — HLL unions only; theta sketches support
    ∩ and \\ directly. At 100 TB you keep one kilobyte sketch per segment
    and answer ANY pairwise overlap from sketches alone (the exact side
    here — a self-join on the distinct (type, user) table — is the
    certification anchor, not the scale path). lgK=14 holds the sketch in
    exact mode up to 16k distinct users per segment, far above every SF the
    gate runs; the 5%+2 tolerance keeps the verdict deterministic even in
    estimation mode."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("theta_sketch_agg(user_id, 14)").alias("sk"),
        F.countDistinct("user_id").alias("nd"),
    )
    pairs = (
        sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"),
                  F.col("nd").alias("nd_a"))
        .join(
            sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")),
            F.col("type_a") < F.col("type_b"),
        )
        .select(
            "type_a", "type_b", "nd_a",
            F.expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))").alias("_ei"),
            F.expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))").alias("_ed"),
        )
    )
    d = ev.select("event_type", "user_id").distinct()
    exact = (
        d.select(F.col("event_type").alias("type_a"), "user_id")
        .join(d.select(F.col("event_type").alias("type_b"), "user_id"),
              ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    tol = lambda x: 0.05 * x + 2  # noqa: E731 — shared bound, both verdicts
    return (
        pairs.join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_intersection", F.lit(0)).alias("exact_intersection"),
            (F.col("nd_a") - F.coalesce("exact_intersection", F.lit(0))).alias(
                "exact_only_a"
            ),
            (F.abs(F.col("_ei") - F.coalesce("exact_intersection", F.lit(0)))
             <= tol(F.coalesce("exact_intersection", F.lit(0)))).alias(
                "intersection_within_tol"
            ),
            (F.abs(
                F.col("_ed")
                - (F.col("nd_a") - F.coalesce("exact_intersection", F.lit(0)))
            ) <= tol(F.col("nd_a"))).alias("difference_within_tol"),
        )
    )


A_THETA_SET_SQL = """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), nd AS (
  SELECT event_type, COUNT(*) AS nd FROM d GROUP BY event_type
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS exact_intersection
  FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT na.event_type AS type_a, nb.event_type AS type_b,
       COALESCE(i.exact_intersection, 0) AS exact_intersection,
       na.nd - COALESCE(i.exact_intersection, 0) AS exact_only_a,
       TRUE AS intersection_within_tol,
       TRUE AS difference_within_tol
FROM nd na JOIN nd nb ON na.event_type < nb.event_type
LEFT JOIN inter i ON i.type_a = na.event_type AND i.type_b = nb.event_type
"""


SPECS = [
    QuerySpec("a_theta_set_ops", a_theta_set_ops, A_THETA_SET_SQL,
              doc="theta-sketch intersection/difference certified vs exact overlap"),
    QuerySpec("a_mad_robust", a_mad_robust, A_MAD_SQL,
              doc="grouped median + MAD (robust scale statistic)"),
    QuerySpec("a_hll_partitioned_merge", a_hll_partitioned_merge, A_HLL_MERGE_SQL,
              doc="per-day HLL sketch union certified: exact anchors + tolerance verdict"),
    QuerySpec("a_heavy_hitters_sketch", a_heavy_hitters_sketch, A_HEAVY_HITTERS_SQL,
              doc="frequent-items sketch certified: exact heavy set + error verdicts"),
    QuerySpec("a_histogram_binned", a_histogram_binned, A_HISTOGRAM_SQL,
              doc="two-pass equi-width histogram per group"),
    QuerySpec("t_vwap_weighted", t_vwap_weighted, T_VWAP_SQL,
              doc="JSON-weighted average per (type, hour) with exact decimal sums"),
]
