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
        analytics10,
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
        analytics10,
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


#: Round-6 sampling priority: written DURING round 6, consumed by the driver
#: at the END of round 6 → CORRECTNESS_r06. Rotation policy (VERDICT r5
#: directive #2): new-this-round queries first, then the 9 queries whose
#: latest driver hash-match is round 2 (the stalest cohort — they sat at
#: positions 51+ of the round-5 sample), then the 47 whose latest green is
#: round 3, oldest verification debt first. With the 50-entry sample window
#: the tail of the round-3 cohort queues for round 7; the round-4/round-5
#: cohorts (green ≤2 rounds ago) keep module order behind the front.
#: Python's sort is stable, so names not listed keep module order.
_FRONT = [
    # (a) new in round 6 (never driver-sampled) — prefix-scan wave first
    "w_running_total_global", "p_skyline_pareto",
    "sample_weighted_systematic", "t_interp_linear",
    "substring_dup_spans", "substring_dup_excise", "ann_ivfadc_index",
    "w_ewma_smooth", "w_ew_volatility", "w_holt_trend",
    "w_cusum_shift", "w_max_drawdown", "w_rolling_median_mad",
    "t_seasonal_residuals",
    # (b) last driver-green in round 2 — the stalest cohort (VERDICT r5 #2)
    "dq_summary_lineitem", "fuzzy_name_pairs",
    "j_interval_views_after_purchase", "p_pivot_status", "p_unpivot_candles",
    "sample_hash_mod", "scd2_customer_versions", "t_tumbling_candles",
    "w_rank_family",
    # (c) last driver-green in round 3 — oldest re-verification debt next;
    # scan/filter/join fundamentals first (highest blast radius if a
    # regression slipped in), then aggregates/windows/curation, then the
    # TPC-H block; the tail past the 50-entry window queues for round 7
    "s1_scan_projection", "p_predicates", "p5_time_of_day",
    "f16_json_extract",
    "j1_left_join", "j2_left_join_composite", "j3_anti_join",
    "j4_surrogate_resolve", "j5_self_band_join", "j6_semi_join",
    "j7_merge_insert_only",
    "a_count_distinct", "a_histogram_binned", "a_mad_robust",
    "a_percentiles", "a_rollup_revenue",
    "w_lag_delta", "t_asof_enrich", "t_hopping_windows", "t_session_window",
    "t_vwap_weighted", "rollup_multires_1h",
    "bpe_pair_stats", "corpus_curation_e2e", "decontam_ngram_overlap",
    "doc_chunking", "gopher_repetition",
    # --- 50-entry sample window ends here (14 new + 9 r2 + 27 r3); below
    # queues for the round-7 rotation ---
    "kmeans_assign_fixed", "pii_redact_scrub", "semantic_dedup_keep",
    "q_daily_user_rank",
    "q_top_customers", "q1_pricing_summary", "q2_min_cost_supplier",
    "q3_shipping_priority", "q4_order_priority", "q5_region_revenue",
    "q6_revenue_change",
    "q10_returned_items", "q12_shipmode_buckets",
    "q13_customer_distribution", "q14_promo_share", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q18_large_orders", "q19_disjunctive_join",
    "q22_global_avg_anti",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
