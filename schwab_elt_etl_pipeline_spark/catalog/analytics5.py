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
    """Mergeable distinct-counting: per-(event_type, day) HLL sketches
    (Apache DataSketches) UNION-merged to a per-type distinct-user estimate.

    THE incremental pattern for distinct metrics at 100 TB: daily partitions
    each keep a kilobyte sketch; any rollup (weekly, global, ad-hoc window)
    is a cheap sketch union — raw data is never rescanned. Rows-only check
    (sketch internals are engine-specific); the estimate's relative error vs
    exact is gated in tests/test_sketch_accuracy.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.expr("hll_sketch_agg(user_id, 12)").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_users"),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .select(
            "event_type",
            F.col("approx_users").cast("long").alias("approx_users"),
            "n_daily_sketches",
        )
    )


def a_heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketched heavy hitters: approx_top_k over corpus tokens — the
    bounded-memory path for frequent-item mining (vs token_vocab_topk's
    exact shuffle). Rows-only check; precision vs the exact top-k is gated
    in tests/test_sketch_accuracy.py."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    return (
        toks.agg(F.expr("approx_top_k(token, 50, 65536)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("token"), F.col("e.count").alias("freq"))
    )


SPECS = [
    QuerySpec("a_mad_robust", a_mad_robust, A_MAD_SQL,
              doc="grouped median + MAD (robust scale statistic)"),
    QuerySpec("a_hll_partitioned_merge", a_hll_partitioned_merge, None,
              doc="per-day HLL sketches union-merged to distinct counts (rows-only)"),
    QuerySpec("a_heavy_hitters_sketch", a_heavy_hitters_sketch, None,
              doc="approx_top_k heavy hitters over corpus tokens (rows-only)"),
    QuerySpec("a_histogram_binned", a_histogram_binned, A_HISTOGRAM_SQL,
              doc="two-pass equi-width histogram per group"),
    QuerySpec("t_vwap_weighted", t_vwap_weighted, T_VWAP_SQL,
              doc="JSON-weighted average per (type, hour) with exact decimal sums"),
]
