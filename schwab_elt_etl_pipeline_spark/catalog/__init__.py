"""Query catalog — the engine's public query surface.

Every operator in SURVEY §2 (plus the LLM-data-pipeline family) is exposed as a
named query spec: a DataFrame builder over the benchmark tables and, where the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string for
differential correctness testing (SURVEY §5.1).

Hash-match conventions (the driver compares row counts, column names, and an
order-insensitive value hash — see repo ``__spark_entry__.py``):

- Monetary aggregates go through ``DECIMAL(18,4)`` so sums are exact and
  engine-order-independent, then cast to DOUBLE for a type-stable output.
- Averages are computed as ``CAST(exact_decimal_sum AS DOUBLE) / count`` — a
  single deterministic IEEE division, bit-identical across engines.
- No raw DECIMAL columns in outputs (Decimal vs float hash differently).
- Window/top-k orderings always carry a unique tiebreaker column.
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry.

    ``oracle`` is ANSI SQL runnable by DuckDB against views named after the
    benchmark tables; ``None`` marks a genuinely non-SQL-expressible operator
    (driver then records a weaker rows-only check).
    ``headline`` selects the query for ``bench.py``.
    """

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    doc: str = ""


def all_specs() -> list[QuerySpec]:
    """Assemble the full registry (import here to keep module load light)."""
    from schwab_elt_etl_pipeline_spark.catalog import (
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        analytics6,
        analytics7,
        analytics8,
        analytics9,
        curation2,
        curation3,
        domain,
        domain_pipeline,
        llm_text,
        multimodal_q,
        operators_demo,
        resolution,
        similarity,
    )

    specs: list[QuerySpec] = []
    for mod in (
        analytics8,
        analytics9,
        curation3,
        analytics6,
        analytics7,
        curation2,
        analytics5,
        analytics,
        analytics2,
        analytics3,
        operators_demo,
        domain,
        domain_pipeline,
        llm_text,
        similarity,
        analytics4,
        multimodal_q,
        resolution,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in catalog"

    # Registry order matters: the driver's correctness gate checks the FIRST
    # 50 queries per round. _FRONT rotates the sample each round so every
    # query re-verifies on a bounded cadence: (a) queries NEW this round,
    # (b) queries whose oracle was upgraded this round (rows-only → SQL),
    # (c) the set whose last green hash-match is oldest (round-1 cohort),
    # (d) as many of the next-oldest (round-2) cohort as fit. Everything
    # else keeps registry order behind them (verified most recently).
    unknown = set(_FRONT) - set(names)
    assert not unknown, f"_FRONT names not in registry (typo?): {sorted(unknown)}"
    front_rank = {name: i for i, name in enumerate(_FRONT)}
    specs.sort(key=lambda s: (front_rank.get(s.name, len(_FRONT)),))
    return specs


#: Round-5 sampling priority: written DURING round 5, consumed by the driver
#: at the END of round 5 → CORRECTNESS_r05 (the r4 verdict flagged the old
#: labels as off-by-one; this naming matches the driver's artifacts). See
#: comment in all_specs(). Python's sort is stable, so names not listed keep
#: module order after the front.
_FRONT = [
    # (a) new in round 5 (never driver-sampled)
    "ann_ivfadc", "ann_pq_index",
    # (b) oracle upgraded rows-only → verdict-level SQL in round 4; they sat
    # at positions 51–54 of the 50-entry round-4 sample, so the upgraded form
    # has never been driver-checked — first in line (VERDICT r4 directive #1)
    "ann_ivf_kmeans", "a_hll_partitioned_merge", "a_heavy_hitters_sketch",
    "a_approx_quantiles",
    # (c) last driver-green in round 1 — the oldest cohort, due re-verification
    "j8_merge_upsert", "j10_join_aggregate", "a1_dedup_distinct",
    "a2_distinct_entities", "j9_batch_dedup", "p9_content_filter",
    "a3a6_two_level_signed", "a7_max_per_entity_ts", "a8_bucket_minmax",
    "a10_dedup_max_pair", "w_moving_avgs", "o2_sort_limit",
    "set_union_branches", "t3_latest_per_key", "t9_gapfill_locf",
    # (d) last driver-green in round 2 — the first 29 fit the 50-entry
    # sample; the remaining 9 queue behind them for round 6
    "flagship_vertical_analytics", "pipeline_verts_e2e", "f2_symbol_pipeline",
    "f5_multiformat_parse", "dedup_exact", "dedup_keep_best",
    "corpus_mix_sample", "curation_pipeline", "text_quality",
    "lang_id_heuristic", "doc_fingerprint", "ngram_jaccard_pairs",
    "dedup_clusters", "token_vocab_topk", "ann_cosine_topk",
    "ann_bucketed_topk", "embedding_near_dup", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "q11_important_suppliers",
    "q15_top_supplier", "q20_part_promotion", "q21_blame_supplier",
    "multimodal_decode", "multimodal_frame_sample", "a_collect_sorted",
    "a_cube_revenue", "a_stats_moments", "dq_summary_lineitem",
    "fuzzy_name_pairs", "j_interval_views_after_purchase", "p_pivot_status",
    "p_unpivot_candles", "sample_hash_mod", "scd2_customer_versions",
    "t_tumbling_candles", "w_rank_family",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
