"""Reusable distributed operators (SURVEY §2.3 J3/J7-J9, §2.5, T9, plus the
LLM-data-pipeline operator family: dedup, similarity search, text analysis,
fuzzy matching, interval joins)."""

from schwab_elt_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
from schwab_elt_etl_pipeline_spark.operators.interval import point_in_interval_join
from schwab_elt_etl_pipeline_spark.operators.merge import (
    insert_new,
    merge_upsert,
    surrogate_key,
)

__all__ = [
    "fuzzy_pairs",
    "gapfill_locf",
    "insert_new",
    "merge_upsert",
    "point_in_interval_join",
    "surrogate_key",
]
