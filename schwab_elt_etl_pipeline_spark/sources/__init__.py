"""Sources — canonical table readers and ingestion helpers."""

from schwab_elt_etl_pipeline_spark.sources.tables import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
