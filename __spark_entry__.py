"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``schwab_elt_etl_pipeline_spark``; this module is
the thin contract layer. The catalog registry (one entry per SURVEY §2
operator family plus the LLM-data-pipeline operators) is assembled in
``schwab_elt_etl_pipeline_spark.catalog``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from schwab_elt_etl_pipeline_spark import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the reference's complete pipeline
    — tick records → Silver (symbol parse, tz convert, session filter,
    MAX-per-(contract,T) dedup) → Gold (minute-grid LOCF, width-5 leg
    pairing, outlier windows, clamp, rolling average) → VERT_TS series."""
    from schwab_elt_etl_pipeline_spark.catalog.domain_pipeline import pipeline_verts_e2e

    return pipeline_verts_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY catalog query (128/128). Probabilistic
    operators emit verdict-level certificates: MinHash/SimHash near-dup
    queries emit verified pairs oracled against brute-force exact Jaccard;
    sketch queries (HLL++, partitioned HLL merge, approx quantiles,
    frequent items) and the trained-IVF ANN emit exact SQL-expressible
    anchors plus within-tolerance verdicts the oracle asserts literally —
    a hash match certifies both the exact semantics and the sketch's error
    bound. No rows-only checks remain."""
    return catalog.oracle_sql()
