"""schwab_elt_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch engine with the query and data-processing capabilities of the
reference financial-market ELT pipeline (Phrendo/schwab-elt-etl-pipeline),
re-expressed Spark-first:

- ``session``    : SparkSession builder tuned for scale (AQE, skew join, pruning).
- ``schemas``    : explicit StructTypes for every domain table (SURVEY §1.2/§1.5).
- ``functions``  : scalar function library (symbol parse/gen, timezones, clamps)
                   as native Column expressions — no Python UDFs in the hot path.
- ``sources``    : canonical readers for parquet tables (incl. nanosecond
                   timestamp normalization) and domain inputs.
- ``operators``  : reusable distributed operators — idempotent merge/insert-new,
                   windowed smoothing, gap-fill/LOCF, dedup (exact/minhash/
                   simhash), similarity search, text analysis.
- ``plans``      : the medallion pipelines (quotes → OPT/OPTM → VERT/VERT_TS,
                   OHLC promote, order-graph flatten → transactions, chains).
- ``streaming``  : Structured Streaming equivalents of the reference's tick
                   ingestion (micro-batch sink, latest-per-key, freshness).

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
