"""Reusable distributed operators (SURVEY §2.3 J3/J7-J9, §2.5, T9, plus the
LLM-data-pipeline operator family: dedup, similarity search, text analysis)."""

from schwab_elt_etl_pipeline_spark.operators.merge import (
    insert_new,
    merge_upsert,
    surrogate_key,
)

__all__ = ["insert_new", "merge_upsert", "surrogate_key"]
