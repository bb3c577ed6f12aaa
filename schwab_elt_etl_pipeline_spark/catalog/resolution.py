"""Interval-join and entity-resolution catalog queries.

Two scale-aware operators the reference lacks, differentially tested: the
point-in-interval join (bucketed — the oracle states the same semantics as a
plain BETWEEN join) and blocked fuzzy matching by edit distance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import QuerySpec
from schwab_elt_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs
from schwab_elt_etl_pipeline_spark.operators.interval import point_in_interval_join
from schwab_elt_etl_pipeline_spark.sources import load_table


def j_interval_views_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Views within one hour after each purchase, per purchase event — the
    bucketed interval join; the oracle is the naive BETWEEN join, proving the
    bucket+residual rewrite is exact."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("p_end"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    hits = point_in_interval_join(
        views,
        purchases,
        point_ts="v_ts",
        start_ts="p_start",
        end_ts="p_end",
        on=["user_id"],
        max_interval_seconds=3600,
    )
    return hits.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("n_views"))


J_INTERVAL_SQL = """
SELECT p.event_id AS purchase_id, COUNT(*) AS n_views
FROM events p
JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND v.ts BETWEEN p.ts AND p.ts + INTERVAL 1 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer names within 1 edit of each other, blocked on the 16-char
    prefix (names are 'Customer#NNNNNNNNN'; the block fixes all but the last
    two digits, so candidate groups stay ≤ 100 rows at any scale)."""
    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_pairs(
        cust,
        id_col="c_custkey",
        text_col="c_name",
        block_exprs=[F.substring("c_name", 1, 16)],
        max_dist=1,
    )


FUZZY_SQL = """
SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
       a.c_name AS a_text, b.c_name AS b_text,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a
JOIN customer b
  ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def scd2_customer_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 over the customer dimension: initial load effective
    1995-01-01, then an update snapshot (every third customer moves segment)
    effective 2000-01-01 — output is the full versioned dimension with
    validity intervals. Mirrored by a pure-SQL oracle building the same
    three row groups (closed v1, untouched v1, new v2)."""
    from schwab_elt_etl_pipeline_spark.operators.scd import scd2_apply, scd2_init

    cust = load_table(spark, sf_dir, "customer")
    t1 = F.lit("1995-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    dim = scd2_init(
        cust.select("c_custkey", "c_mktsegment", t1.alias("effective_at")),
        keys=["c_custkey"],
        attrs=["c_mktsegment"],
    )
    updates = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        t2.alias("effective_at"),
    )
    out = scd2_apply(
        dim, updates, keys=["c_custkey"], attrs=["c_mktsegment"]
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.col("valid_from").cast("timestamp_ntz").alias("valid_from"),
        F.col("valid_to").cast("timestamp_ntz").alias("valid_to"),
        "is_current",
    )


SCD2_SQL = """
WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
SELECT c_custkey, c_mktsegment,
       TIMESTAMP '1995-01-01' AS valid_from,
       TIMESTAMP '2000-01-01' AS valid_to,
       FALSE AS is_current
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, c_mktsegment,
       TIMESTAMP '1995-01-01', CAST(NULL AS TIMESTAMP), TRUE
FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)
UNION ALL
SELECT c_custkey, 'MOVED',
       TIMESTAMP '2000-01-01', CAST(NULL AS TIMESTAMP), TRUE
FROM customer WHERE c_custkey IN (SELECT c_custkey FROM changed)
"""


def dq_summary_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ rules over lineitem (the reference's embedded guards,
    lifted into one conditional-aggregation pass)."""
    from schwab_elt_etl_pipeline_spark.operators.quality import dq_summary

    li = load_table(spark, sf_dir, "lineitem")
    return dq_summary(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "price_nonneg": F.col("l_extendedprice") >= 0,
            "discount_unit_range": F.col("l_discount").between(0, 1),
            "shipdate_present": F.col("l_shipdate").isNotNull(),
            "flag_known": F.col("l_returnflag").isin("A", "N", "R"),
        },
    )


DQ_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN COALESCE(l_quantity > 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS viol_qty_positive,
       CAST(SUM(CASE WHEN COALESCE(l_extendedprice >= 0, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS viol_price_nonneg,
       CAST(SUM(CASE WHEN COALESCE(l_discount BETWEEN 0 AND 1, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS viol_discount_unit_range,
       CAST(SUM(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS viol_shipdate_present,
       CAST(SUM(CASE WHEN COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS viol_flag_known
FROM lineitem
"""


SPECS = [
    QuerySpec(
        "j_interval_views_after_purchase",
        j_interval_views_after_purchase,
        J_INTERVAL_SQL,
        headline=True,
        doc="bucketed point-in-interval join vs naive BETWEEN oracle",
    ),
    QuerySpec(
        "fuzzy_name_pairs",
        fuzzy_name_pairs,
        FUZZY_SQL,
        doc="blocked Levenshtein entity resolution",
    ),
    QuerySpec(
        "scd2_customer_versions",
        scd2_customer_versions,
        SCD2_SQL,
        doc="SCD Type 2 versioned dimension (validity intervals)",
    ),
    QuerySpec(
        "dq_summary_lineitem",
        dq_summary_lineitem,
        DQ_SQL,
        doc="declarative data-quality rule summary, one pass",
    ),
]
