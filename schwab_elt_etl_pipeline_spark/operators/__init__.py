"""Reusable distributed operators (SURVEY §2.3 J3/J7-J9, §2.5, T9, plus the
LLM-data-pipeline operator family: dedup, similarity search, text analysis,
fuzzy matching, interval joins, sampling, data quality, SCD2)."""

from schwab_elt_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
from schwab_elt_etl_pipeline_spark.operators.interval import point_in_interval_join
from schwab_elt_etl_pipeline_spark.operators.merge import (
    insert_new,
    merge_upsert,
    surrogate_key,
)
from schwab_elt_etl_pipeline_spark.operators.quality import dq_summary, quarantine
from schwab_elt_etl_pipeline_spark.operators.sampling import (
    hash_bucket,
    stratified_hash_sample,
)
from schwab_elt_etl_pipeline_spark.operators.scd import scd2_apply, scd2_init

__all__ = [
    "dq_summary",
    "fuzzy_pairs",
    "gapfill_locf",
    "hash_bucket",
    "insert_new",
    "merge_upsert",
    "point_in_interval_join",
    "quarantine",
    "scd2_apply",
    "scd2_init",
    "stratified_hash_sample",
    "surrogate_key",
]
