"""Reusable distributed operators (SURVEY §2.3 J3/J7-J9, §2.5, T9, plus the
LLM-data-pipeline operator family: dedup, similarity search, text analysis,
fuzzy matching, interval joins, sampling, data quality, SCD2, skew handling,
multimodal plumbing)."""

from schwab_elt_etl_pipeline_spark.operators.dedup import (
    connected_components,
    exact_dup_groups,
    jaccard,
    minhash_lsh_candidates,
    minhash_signature,
    passage_dedup_rebuild,
    substring_dedup_rebuild,
    simhash64,
    simhash_near_dups,
    with_shingles,
)
from schwab_elt_etl_pipeline_spark.operators.curation import (
    decontaminate,
    eval_gram_set,
    pii_counts,
    pii_redact,
    repetition_stats,
    semantic_dedup_verdicts,
)
from schwab_elt_etl_pipeline_spark.operators.bloom import bloom_member, build_bloom
from schwab_elt_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs
from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
from schwab_elt_etl_pipeline_spark.operators.graph import triangle_counts
from schwab_elt_etl_pipeline_spark.operators.interval import point_in_interval_join
from schwab_elt_etl_pipeline_spark.operators.merge import (
    insert_new,
    merge_upsert,
    surrogate_key,
)
from schwab_elt_etl_pipeline_spark.operators.multimodal import (
    decode_stub_features,
    frame_sample_plan,
    resize_stub,
)
from schwab_elt_etl_pipeline_spark.operators.quality import (
    dq_summary,
    mad_drift,
    quarantine,
)
from schwab_elt_etl_pipeline_spark.operators.rollup import (
    rollup_coarser,
    rollup_minutes,
    rollup_read,
)
from schwab_elt_etl_pipeline_spark.operators.sampling import (
    exact_k_per_group,
    hash_bucket,
    hash_rank_key,
    stratified_hash_sample,
)
from schwab_elt_etl_pipeline_spark.operators.scd import scd2_apply, scd2_init
from schwab_elt_etl_pipeline_spark.operators.similarity import (
    brute_force_topk,
    bucketed_ann_topk,
    cosine,
    ivf_kmeans_topk,
    ivfpq_topk,
    pq_adc_topk,
    pq_encode,
    pq_train_codebooks,
    projected_rerank_topk,
)
from schwab_elt_etl_pipeline_spark.operators.tokenize import (
    apply_pair_merges,
    explode_tokens,
    rebuild_docs,
)
from schwab_elt_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join_skewed_left,
)
from schwab_elt_etl_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    token_count,
)
from schwab_elt_etl_pipeline_spark.operators.recurrence import linear_recurrence
from schwab_elt_etl_pipeline_spark.operators.smooth import ewma
from schwab_elt_etl_pipeline_spark.operators.windows import (
    leading_avg,
    rolling_avg,
    trailing_avg,
    with_outlier_flag,
)

__all__ = [
    "apply_pair_merges",
    "bloom_member",
    "bpe_ish_token_count",
    "build_bloom",
    "explode_tokens",
    "mad_drift",
    "ivfpq_topk",
    "pq_adc_topk",
    "pq_encode",
    "pq_train_codebooks",
    "projected_rerank_topk",
    "rebuild_docs",
    "triangle_counts",
    "exact_k_per_group",
    "hash_rank_key",
    "passage_dedup_rebuild",
    "substring_dedup_rebuild",
    "brute_force_topk",
    "bucketed_ann_topk",
    "connected_components",
    "cosine",
    "decode_stub_features",
    "decontaminate",
    "dq_summary",
    "eval_gram_set",
    "ewma",
    "exact_dup_groups",
    "fingerprint",
    "frame_sample_plan",
    "fuzzy_pairs",
    "gapfill_locf",
    "hash_bucket",
    "insert_new",
    "ivf_kmeans_topk",
    "jaccard",
    "lang_id",
    "leading_avg",
    "linear_recurrence",
    "merge_upsert",
    "minhash_lsh_candidates",
    "minhash_signature",
    "pii_counts",
    "pii_redact",
    "point_in_interval_join",
    "quarantine",
    "repetition_stats",
    "resize_stub",
    "rolling_avg",
    "rollup_coarser",
    "rollup_minutes",
    "rollup_read",
    "salted_agg",
    "salted_join_skewed_left",
    "scd2_apply",
    "scd2_init",
    "semantic_dedup_verdicts",
    "simhash64",
    "simhash_near_dups",
    "stratified_hash_sample",
    "surrogate_key",
    "token_count",
    "trailing_avg",
    "with_outlier_flag",
    "with_shingles",
]
