"""Physical-plan regression tests: the optimizations the engine relies on at
scale (pushdown, pruning, broadcast strategies, bounded shuffle counts) must
stay in the executed plan — a correctness-preserving refactor that silently
reverts one of these is a 100 TB performance bug, not a style change.

``executedPlan`` (after AQE planning) is inspected as text, the same surface
``explain("formatted")`` prints.
"""

from __future__ import annotations

import pytest

from schwab_elt_etl_pipeline_spark.catalog import all_specs

SPECS = {s.name: s for s in all_specs()}


def plan_of(spark, sf_dir, name: str) -> str:
    return SPECS[name].build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def scan_lines(plan: str) -> list[str]:
    return [l for l in plan.splitlines() if "FileScan parquet" in l]


def test_star_join_broadcasts_not_smj(spark, sf_dir):
    """q5's dimension-first reduction: every join broadcast, no sort-merge."""
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_region_filter_pushed_to_scan(spark, sf_dir):
    """The r_name = 'ASIA' predicate must reach the region file scan."""
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    region_scans = [l for l in scan_lines(plan) if "r_name" in l]
    assert region_scans and any("= ASIA" in l for l in region_scans)


def test_q1_two_tiny_exchanges_and_pruned_scan(spark, sf_dir):
    """Scan-filter-aggregate, r13 long-sum form: the hot aggregate sums
    integer-scaled longs per (group, input partition) — partial agg still
    combines map-side, so the first exchange carries <= |groups|x|partitions|
    partial rows — and a second tiny exchange merges the partials as
    decimals (value-equality pinned by tests/test_decimal_longsum.py).
    Exactly two exchanges, neither carrying raw rows, and the scan reads
    only the 7 referenced columns."""
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("Exchange") == 2
    # both exchanges sit ABOVE a HashAggregate (partial-agg outputs), never
    # directly above the scan/filter — i.e. no raw-row shuffle
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "_pid" in line or "l_returnflag" in line
    (scan,) = scan_lines(plan)
    assert "l_shipdate" in scan and "l_comment" not in scan and "l_partkey" not in scan


def test_projection_prunes_columns_no_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "s1_scan_projection")
    assert plan.count("Exchange") == 0
    (scan,) = scan_lines(plan)
    assert "l_extendedprice" in scan and "l_comment" not in scan


def test_silver_opt_resolve_is_broadcast(spark, sf_dir):
    """J4 surrogate-key resolution joins the tiny OPT master by broadcast."""
    plan = plan_of(spark, sf_dir, "j4_surrogate_resolve")
    assert "BroadcastHashJoin" in plan


def test_flagship_whole_stage_codegen_spans(spark, sf_dir):
    """The Gold window pipeline must stay inside whole-stage codegen.
    Codegen ids only exist on the FINAL adaptive plan, so execute first
    (look for codegen-id markers, not the literal class name)."""
    df = SPECS["flagship_vertical_analytics"].build(spark, sf_dir)
    qe = df._jdf.queryExecution()
    df.collect()  # finalize THIS query execution (write would start its own)
    plan = qe.executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # whole-stage-codegen spans render as a leading "*(n)" on operators
    assert "*(1)" in plan


def test_outlier_windows_not_duplicated(spark, sf_dir):
    """The W1/W2 outlier flag must evaluate exactly 4 sliding aggregates
    (2 sums + 2 counts) — embedding window Columns per reference would
    silently double them (no CSE across window expressions). (r14: the r13
    prefix-difference form was REVERTED after measured A/Bs — at 5/11-row
    frames the sliding buffer beats prefix+lag/lead at BOTH 1x and the 10x
    replica; w_rolling_zscore keeps the rewrite, its frame is 20 rows and
    the driver measured 1.99x. This restores the pre-r13 pin.)"""
    plan = plan_of(spark, sf_dir, "flagship_vertical_analytics")
    w12 = [l for l in plan.splitlines() if "RowFrame, -5, -1" in l]
    assert w12, "trailing window vanished from the plan"
    assert all(l.count("RowFrame, -5, -1") <= 2 for l in w12)


def test_e2e_tick_dedup_below_decode(spark, sf_dir):
    """pipeline_verts_e2e groups on integer keys straight off the scan: no
    lineitem scan stage may contain the symbol formatter (the encode runs on
    the 82-row dimension, not the 600k-row fact), and the dimension joins
    are broadcasts."""
    plan = plan_of(spark, sf_dir, "pipeline_verts_e2e")
    assert plan.count("BroadcastHashJoin") >= 2
    li_scans = [l for l in scan_lines(plan) if "l_partkey" in l]
    assert li_scans and all("format_string" not in l for l in li_scans)


@pytest.mark.parametrize("name", ["dedup_exact", "token_vocab_topk", "gopher_repetition"])
def test_corpus_aggregations_have_partial_agg(spark, sf_dir, name):
    """Corpus statistics must combine map-side: two HashAggregate levels
    around each exchange, never a raw-row shuffle into a single agg."""
    plan = plan_of(spark, sf_dir, name)
    assert plan.count("HashAggregate") >= 2 or plan.count("ObjectHashAggregate") >= 2


# ---------------------------------------------------------------------------
# engine-wide sweep: scale-killer nodes banned across the whole catalog
# ---------------------------------------------------------------------------

#: Queries where a BroadcastNestedLoopJoin is the INTENDED plan: a crossJoin
#: against a broadcast 1-row scalar aggregate (grand totals, strike ranges,
#: funnel base) or a ≤16-row literal (centroids, query vectors). Anything
#: else acquiring a BNLJ is a join that lost its equi-key — a 100 TB bug.
_BNLJ_OK = {
    "phrase_detection_pmi",  # 1-row token-total scalar
    "assoc_rules_lift",      # 1-row basket-total scalar
    "unigram_rarity",        # 1-row corpus-total scalar
    "tfidf_topk_keywords",   # 1-row doc-count scalar
    "boilerplate_line_scrub",  # 1-row doc-count threshold scalar
    "semantic_decontam_select",  # corpus x broadcast eval-anchor set
    "kneser_ney_score",      # 1-row bigram-type-total scalar
    "event_funnel",          # 1-row base-population scalar
    "ann_cosine_topk",       # ≤8-row query-vector set
    "retrieval_mmr_diverse",  # pool stage: ≤8-row query-vector set
    "retrieval_rrf_hybrid",  # 1-row query-vector set (dense arm)
    "kmeans_lloyd_train",    # ≤8-row centroid table (E-step)
    "ann_projected_rerank",  # ≤8-row query-vector set (coarse sketch pass)
    "embedding_near_dup",    # ≤8-row probe set
    "ann_ivf_kmeans",        # ≤16-row centroid table
    "ann_pq_adc",            # ≤8-row query-vector set (exact-anchor pass)
    "ann_ivfadc",            # ≤8-row query-vector set (exact-anchor pass)
    "ann_pq_index",          # ≤8-row query-vector set (exact-anchor pass)
    "ann_ivfadc_index",      # ≤8-row query-vector set (exact-anchor pass)
    "kmeans_assign_fixed",   # ≤16-row centroid table
    "semdedup_prune",        # ≤8-row centroid table (cell-assignment E-step)
    "q11_important_suppliers",  # 1-row global-threshold scalar
    "q22_global_avg_anti",   # 1-row global-average scalar
    "dq_expectations_orders",  # crossJoin of two 1-row check aggregates
    "a_heavy_hitters_sketch",  # 1-row token-total scalar + 1-row sketch list
    "bm25_retrieval",        # 1-row corpus-stats scalar
    "a_theta_set_ops",       # |event_types|^2 pair join (5x5) on broadcast sketches
    "quality_quantile_gate",  # 1-row percentile-threshold scalar
    "bigram_lm_perplexity_gate",  # 1-row corpus-totals + threshold scalars
    "unigram_lm_em_round",   # 1-row M-step total scalar
    "unigram_lm_em_iterated",  # 1-row M-step total scalar
    "unigram_lm_tokenize",   # 1-row M-step total scalar (training stage)
    "perplexity_bucket_split",  # 1-row corpus-totals + cut scalars
    "dsir_importance_select",  # 1-row model-totals + shift scalars
    "doremi_mixture_reweight",  # 1-row mixture/reference/max-excess scalars per round
    "a_equidepth_hist",      # 1-row decile-boundary scalar
    "j_bloom_semi_join",     # 1-row 2KiB bloom-bitmap scalar
    "training_prep_e2e",     # 1-row percentile-threshold scalar
    "training_prep_ffd_e2e",  # same 1-row threshold scalar (shared front)
}


def test_bm25_is_shuffle_free(spark, sf_dir):
    """bm25_retrieval's only exchanges are the 1-row corpus-stats all-reduce
    (SinglePartition) and its broadcast — no data-keyed shuffle may appear
    (the per-doc tf path is map-only by design)."""
    plan = plan_of(spark, sf_dir, "bm25_retrieval")
    assert "hashpartitioning" not in plan, "data-keyed shuffle crept into BM25"


def test_passage_dedup_two_data_shuffles(spark, sf_dir):
    """passage_dedup shuffles exactly twice by construction: once keyed on
    the passage (first-occurrence window) and once on the doc (reassembly).
    More means a lost partitioning reuse; the input repartition on doc_id is
    the explicitly keyed scan spread (small single-file local input)."""
    plan = plan_of(spark, sf_dir, "passage_dedup")
    n_hash = plan.count("hashpartitioning")
    assert n_hash <= 3, f"extra shuffle in passage_dedup plan: {n_hash}"


def test_sequence_packing_partitions_by_shard(spark, sf_dir):
    """The packing cumsum must window over hashpartitioning(source…), never
    a SinglePartition global ordering — the difference between a scalable
    per-shard plan and a driver-shaped bottleneck at 100 TB."""
    plan = plan_of(spark, sf_dir, "sequence_packing")
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


# Same fast/slow tier as test_catalog_oracle (r13 verdict #2): executedPlan()
# materializes every eager checkpoint in the build, so for the iterative
# trainers this "plan" test pays the full many-job build (~10-30 s each at
# local[4]). The slow tier still runs in the close-gate full suite.
_SLOW_PLAN = {
    "ann_ivfadc_index",
    "ann_pq_index",
    "ann_pq_adc",
    "ann_ivfadc",
    "leakage_safe_split",
}


@pytest.mark.parametrize(
    "spec",
    [
        pytest.param(
            s, id=s.name, marks=[pytest.mark.slow] if s.name in _SLOW_PLAN else []
        )
        for s in SPECS.values()
    ],
)
def test_no_scale_killer_nodes(spark, sf_dir, spec):
    """No catalog plan may contain a CartesianProduct (non-broadcast
    cartesian: quadratic shuffle at scale) or BatchEvalPython (row-at-a-time
    Python in the hot path); BroadcastNestedLoopJoin only at the allowlisted
    scalar-broadcast sites above."""
    plan = spec.build(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{spec.name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{spec.name}: row-at-a-time Python UDF"
    if spec.name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{spec.name}: nested-loop join outside the scalar-broadcast allowlist"
        )


def test_substring_dedup_shuffle_budget(spark, sf_dir):
    """substring_dedup's exchanges by construction: window-key rank, the
    dup-start join, and the doc-keyed sweep/rebuild (+ the explicit input
    spread). More means a lost partitioning reuse; the rank key must be the
    8-byte fingerprint, never the window text."""
    plan = plan_of(spark, sf_dir, "substring_dedup")
    n_hash = plan.count("hashpartitioning")
    assert n_hash <= 4, f"extra shuffle in substring_dedup plan: {n_hash}"
    import re

    # the rank exchange must partition on a LONG (the xxhash64 fingerprint,
    # e.g. 'hashpartitioning(wtext#14L'), never the raw window string
    assert re.search(r"hashpartitioning\(wtext#\d+L", plan), (
        "rank key is not the 8-byte fingerprint"
    )


def test_recurrence_scan_exchange_budget(spark, sf_dir):
    """The linear-recurrence scan (w_holt_trend) pays: the entity-keyed
    window exchange, the chunk-summary aggregate exchange(s), and the
    summary join-back — never a SinglePartition stage, never Python, and
    the matrix-power lookups are plan literals (no extra table/scan)."""
    plan = plan_of(spark, sf_dir, "w_holt_trend")
    assert plan.count("Exchange") <= 4
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one events scan feeds both the ranked rows and the summaries
    assert len(scan_lines(plan)) <= 2


def test_seasonal_residuals_baselines_broadcast(spark, sf_dir):
    """Both the (event_type, hod) baseline and MAD tables are bounded
    (types x 24) and must join by broadcast — no SMJ on the fact side."""
    plan = plan_of(spark, sf_dir, "t_seasonal_residuals")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
