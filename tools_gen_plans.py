"""Regenerate PLANS.md: executed physical plans of the heaviest headline
queries at $SPARK_GRAFT_SF_DIR (default sf0.1), with the engine's session
confs. Run after any plan-affecting change so the committed plans stay
honest; the plan-shape invariants themselves are enforced by
tests/test_plan_shapes.py and tests/test_plan_properties.py.
"""

from __future__ import annotations

import os

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark

_NAMES = [
    "pipeline_verts_e2e",
    "bpe_apply_merges",
    "graph_triangle_counts",
    "embedding_curation_e2e",
    "training_prep_e2e",
    "neardup_canonicalize",
    "corpus_curation_e2e",
    "q1_pricing_summary",
    "bm25_retrieval",
    "passage_dedup",
    "substring_dedup",
    "substring_dup_spans",
    "substring_dup_excise",
    "t9_gapfill_locf",
    "w_holt_trend",
    "assoc_rules_lift",
    "t_acf_lags",
    "graph_label_propagation",
    "retrieval_rrf_hybrid",
    "first_seen_novelty",
    "kmeans_lloyd_train",
    "bigram_lm_perplexity_gate",
    "image_phash_neardup",
    "sequence_packing_ffd",
    "doremi_mixture_reweight",
    "audio_fp_neardup",
    "boilerplate_line_scrub",
    "wordpiece_tokenize",
    "semantic_decontam_select",
    "kneser_ney_score",
    "video_phash_neardup",
    "url_canonicalize_dedup",
    "intradoc_dedup",
    "shard_manifest_hash",
    "pii_scrub",
    "semdedup_prune",
    "mixture_sample_ppm",
    "domain_quality_gate",
    "unicode_scrub",
    "html_strip",
]

_HEADER = """# PLANS — executed physical plans of the heaviest headline queries

Auto-generated (`python tools_gen_plans.py`) at sf0.1 with the engine's
session confs (AQE on). What to look for, per ARCHITECTURE.md: predicate
pushdown + pruned `ReadSchema` on every scan, `BroadcastHashJoin` on dim
sides, two `HashAggregate` levels around each exchange (map-side combine),
`*(n)` whole-stage-codegen spans over the scalar pipelines, and no
`CartesianProduct` / `BatchEvalPython` anywhere.
"""


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plansdoc")
    specs = {s.name: s for s in all_specs()}
    out = [_HEADER]
    for name in _NAMES:
        df = specs[name].build(spark, sf_dir)
        qe = df._jdf.queryExecution()
        df.collect()  # finalize AQE so isFinalPlan=true plans are captured
        plan = qe.executedPlan().toString()
        if len(plan) > 9000:
            plan = plan[:9000] + "\n... [truncated]"
        out.append(f"## {name}\n\n```\n{plan}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
