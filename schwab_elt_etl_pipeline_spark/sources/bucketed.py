"""Bucketed (co-located) tables: pre-shuffled storage for repeat joins.

The warehouse's ``ParquetTable`` covers path-based tables (versioning,
time travel, clustered layout for footer-stat pruning); THIS module covers
the session-catalog side Spark needs for bucket metadata: a table written
``bucketBy(n, keys)`` records its hash partitioning in the catalog, and a
join (or aggregation) on those keys then plans with ZERO exchanges — both
sides read already co-partitioned and co-sorted.

At 100 TB this is the amortization play: the two big fact tables that join
every hour pay their shuffle ONCE at write time; every subsequent join is
map-side. Bucket counts must match (or divide) across join sides, and the
join keys must be a prefix of the bucket keys — helpers below make both
explicit. tests/test_bucketed_join.py pins the exchange-free plan AND value
equality with the plain shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    name: str,
    buckets: int,
    keys: list[str],
    sort: bool = True,
) -> None:
    """Write ``df`` as a catalog table bucketed (and optionally sorted) by
    ``keys`` — the one-time shuffle that later joins skip."""
    writer = df.write.bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.mode("overwrite").format("parquet").saveAsTable(name)


def bucket_spec(spark: SparkSession, name: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_keys) from the catalog, or None if unbucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    num, cols = None, None
    for r in rows:
        if r.col_name == "Num Buckets":
            num = int(r.data_type)
        if r.col_name == "Bucket Columns":
            cols = [c.strip(" `") for c in r.data_type.strip("[]").split(",")]
    if num is None or cols is None:
        return None
    return num, cols


def cobucketed(spark: SparkSession, left: str, right: str, keys: list[str]) -> bool:
    """True when a join of ``left`` and ``right`` on ``keys`` is co-located:
    both bucketed on exactly the join keys with EQUAL bucket counts — or
    divisible counts when bucket coalescing is actually on
    (``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` defaults to
    FALSE, so a divides-relationship alone still plans an Exchange; the
    helper must not certify a join the planner will shuffle)."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    if ls is None or rs is None:
        return False
    (ln, lk), (rn, rk) = ls, rs
    if lk != keys or rk != keys:
        return False
    if ln == rn:
        return True
    coalesce_on = (
        spark.conf.get(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
        ).lower()
        == "true"
    )
    return coalesce_on and (ln % rn == 0 or rn % ln == 0)
