"""JDBC table source/sink — the reference's SQL-database surface, real.

The reference lands every table in SQL Server through pyodbc row inserts
guarded by ``IF NOT EXISTS`` (tools/db.py) and reads them back for the next
pipeline stage. Spark's stock ``df.write.jdbc`` covers the transport; this
module adds the two semantics the reference actually relies on:

- :func:`insert_new_jdbc` — the dup-guarded batch insert (SURVEY S6): only
  rows whose natural key is absent from the target table are appended, so
  re-running a batch adds zero rows. The guard is one anti-join against the
  CURRENT table keys (pushed down as a key-column-only JDBC read), replacing
  the reference's per-row round-trips with two set operations.
- partition-parallel reads via ``partitionColumn`` bounds, so a big table
  read fans out across executors instead of one connection.

Tested against Derby EMBEDDED (the JDBC driver Spark itself bundles for the
Hive metastore), so the round-trip runs in any harness with zero external
services; the same calls take a SQL Server/Postgres URL + driver unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(directory: str, name: str = "db") -> str:
    """Embedded-Derby URL under ``directory`` (created on first use)."""
    return f"jdbc:derby:{directory}/{name};create=true"


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str = DERBY_DRIVER,
) -> None:
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .mode(mode)
        .save()
    )


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """JDBC read; pass ``partition_column`` + bounds to fan the scan out
    over ``num_partitions`` parallel connections (one connection otherwise —
    the difference between a night and an hour on a big table)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()


def table_exists(
    spark: SparkSession, url: str, table: str, driver: str = DERBY_DRIVER
) -> bool:
    try:
        read_jdbc(spark, url, table, driver=driver).schema
        return True
    except Exception:
        return False


def insert_new_jdbc(
    batch: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    driver: str = DERBY_DRIVER,
) -> None:
    """Dup-guarded append (S6): write only batch rows whose key is not
    already present; replayed batches add ZERO rows.

    The existing-key read projects the key columns only (column pruning
    crosses the JDBC boundary), and the batch is pre-deduped on the key so
    one batch cannot insert the same key twice. NOTE: like the reference's
    ``IF NOT EXISTS`` inserts, this is idempotence against replays, not
    serializable protection against concurrent writers of the same key —
    pair with the warehouse's conflict-detect MERGE when that matters.
    """
    fresh = batch.dropDuplicates(keys)
    if table_exists(batch.sparkSession, url, table, driver=driver):
        existing = read_jdbc(batch.sparkSession, url, table, driver=driver).select(
            *keys
        )
        fresh = fresh.join(existing, on=keys, how="left_anti")
        write_jdbc(fresh, url, table, mode="append", driver=driver)
    else:
        write_jdbc(fresh, url, table, mode="errorifexists", driver=driver)
