"""Sources — canonical table readers and ingestion helpers."""

from schwab_elt_etl_pipeline_spark.sources.rest_datasource import (
    RestJsonDataSource,
)
from schwab_elt_etl_pipeline_spark.sources.rest_datasource import (
    register as register_rest_datasource,
)
from schwab_elt_etl_pipeline_spark.sources.tables import (
    TABLES,
    conform_to_schema,
    load_table,
    read_bronze_quotes,
    register_views,
    spread_scan,
)

__all__ = [
    "TABLES",
    "RestJsonDataSource",
    "conform_to_schema",
    "load_table",
    "spread_scan",
    "read_bronze_quotes",
    "register_rest_datasource",
    "register_views",
]
