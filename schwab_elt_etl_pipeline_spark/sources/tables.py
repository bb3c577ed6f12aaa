"""Canonical readers for the benchmark/test parquet tables.

Replaces the reference's ``OPENROWSET(BULK …, FORMAT='PARQUET')`` staging scan
(docs/sql_server.md:105-170) with direct ``spark.read.parquet``. Spark gets
predicate pushdown / column pruning on these scans for free; callers should
``select``/``filter`` on the returned DataFrame so pruning reaches the reader.

Normalizations applied (and why):

- ``events.ts`` is written as parquet TIMESTAMP(NANOS, isAdjustedToUTC=false),
  which Spark rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong``
  the column arrives as nanoseconds-since-epoch LONG and is converted here to
  microsecond TIMESTAMP_NTZ (same wall-clock values DuckDB/pyarrow report).
- Instant-typed timestamps are cast to TIMESTAMP_NTZ under a pinned UTC
  session so all engines agree on wall-clock values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.session import ensure_engine_confs

#: All tables the harness provides at each scale-factor directory.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one benchmark table, normalized (see module docstring)."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros with INTEGER division ("/" would round-trip through
        # double and lose precision above 2^53 ns); TIMESTAMP_NTZ keeps
        # wall-clock semantics tz-free.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan up to the session's default parallelism
    — but ONLY when the scan cannot already feed every core (guide §2.5:
    input skew from one small/unsplittable file; our single-row-group test
    parquet files cap every scan at 1 task no matter the split size).

    Scale-adaptive by construction: on a real cluster the input is many
    files/row-groups, ``getNumPartitions() >= defaultParallelism`` holds, and
    NO extra exchange is inserted — so this is not a local-only tuning knob
    but a guard for exactly the degenerate-input case. Use it where the
    per-row downstream work is heavy (vector folds, pair joins); for cheap
    scan→agg paths the added exchange loses (see q1's inline note).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    # The partition probe forces a plan->RDD conversion on the driver; its
    # answer for a SCAN depends only on (file set, split confs, parallelism),
    # so memoize it per input file list (r14 hygiene: the probe itself was
    # the same per-build driver cost class spread_scan's callers pay it to
    # avoid). Plan-shape state only — no data, no results.
    files = tuple(sorted(df.inputFiles()))
    key = (id(spark.sparkContext), target, files)
    # a non-scan input reports no files — don't share a cache line for those
    spread = _SPREAD_CACHE.get(key) if files else None
    if spread is None:
        spread = df.rdd.getNumPartitions() < target
        if len(_SPREAD_CACHE) >= 32:  # bound driver-side state
            _SPREAD_CACHE.clear()
        _SPREAD_CACHE[key] = spread
    if not spread:
        return df
    return df.repartition(target)


_SPREAD_CACHE: dict[tuple, bool] = {}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view (for ``spark.sql`` pipelines)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def conform_to_schema(df: DataFrame, schema) -> DataFrame:
    """Normalize a drifting-schema DataFrame onto an explicit StructType:
    missing columns appear as typed nulls, extra columns are dropped, and
    every column is cast to the declared type, in declared order.

    This is the engine's answer to the reference's drop-and-recreate staging
    "to handle schema changes" (docs/sql_server.md:124-126): Bronze accepts
    whatever columns accumulated, Silver conforms to the contract. Pure
    projection — no shuffle, stays in the scan's codegen stage."""
    present = {f.name for f in df.schema.fields}
    return df.select(
        *[
            (F.col(f.name) if f.name in present else F.lit(None)).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


def read_bronze_quotes(spark: SparkSession, path: str) -> DataFrame:
    """Read a Bronze quotes directory whose daily files have drifted schemas
    (the stream writes whatever sparse field ids accumulated per day,
    services/schwab_stream.py:308-313 / tools/parquet_writer.py:39-43):
    ``mergeSchema`` unions the per-file schemas, then the result is conformed
    to the canonical QUOTES_STREAM contract."""
    from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM

    ensure_engine_confs(spark)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    return conform_to_schema(df, QUOTES_STREAM)
