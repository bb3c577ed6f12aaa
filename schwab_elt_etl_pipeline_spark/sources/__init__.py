"""Sources — canonical table readers and ingestion helpers."""

from schwab_elt_etl_pipeline_spark.sources.tables import (
    TABLES,
    conform_to_schema,
    load_table,
    read_bronze_quotes,
    register_views,
)

__all__ = ["TABLES", "conform_to_schema", "load_table", "read_bronze_quotes", "register_views"]
