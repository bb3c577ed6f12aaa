"""10× scale-stress harness (VERDICT r4 directive #4).

Synthesizes a 10× replica of the sf0.1 tables the heaviest headline queries
read (key-shifted + content-perturbed so cardinalities and dup structure
scale LINEARLY — naive duplication would square the true-duplicate mass and
stress a different query than the one we ship), then times each query at 1×
and 10× and writes ``SCALE.md``.

What the ratio certifies: shuffle-bound plans should scale near-linearly
(ratio ≈ 10×, with sub-linear constant amortization commonly pulling it
below) — a super-linear blow-up (≫ 12×) flags an AQE plan-flip (e.g. a
broadcast side outgrowing the threshold into a BNLJ) or quadratic candidate
growth, exactly the failure mode that only appears at larger cardinality.

Run: ``python tools_scale_stress.py`` (env: SPARK_GRAFT_SF_DIR base 1× dir,
SCALE_STRESS_DIR replica dir, SCALE_STRESS_FACTOR).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.catalog import all_specs
from schwab_elt_etl_pipeline_spark.session import get_spark

#: The 5 most expensive BENCH_r04 queries (judge-audited) + substring_dedup
#: (6th, tied) — the shuffle-heaviest plans in the headline set — plus the
#: round-6 byte-exact span finder, whose stride-1 char-window explode is the
#: biggest row blow-up in the catalog (worth stressing: exact windows
#: survive the copy-tag perturbation unchanged, so at 10× nearly EVERY
#: window is duplicated — a harsher duplication regime than production).
QUERIES = [
    "pipeline_verts_e2e",
    "neardup_canonicalize",
    "training_prep_e2e",
    "embedding_curation_e2e",
    "w_rolling_zscore",
    "substring_dedup",
    "substring_dup_spans",
    "substring_dup_excise",
    # round-6 prefix-scan wave: the global-order plans whose NAIVE form
    # (SinglePartition window) cannot scale at all — the ratio certifies the
    # two-phase scan stays linear as the order line grows 10×
    "sample_weighted_systematic",
    "t_interp_linear",
    # linear-recurrence scan: the key shift gives 10x MORE users with the
    # same series length — the ratio certifies the chunked matrix-power
    # fold is per-entity work with no global stage
    "w_holt_trend",
    # round-7 additions: the cluster-safe split runs pairwise Jaccard +
    # pointer-jumping components end-to-end (copy-tagged replicas grow the
    # cluster count linearly); the BPE learn loop is k full corpus passes,
    # so its ratio certifies per-iteration linearity
    "leakage_safe_split",
    "bpe_train_merges",
    # round-7 behavioral wave: baskets/series grow as 10× MORE users (the
    # key shift), item/event-type vocabulary stays fixed — the ratios
    # certify the vocabulary-bounded pair expansion (assoc), the
    # per-entity window scan (acf), and the vocab²-bounded vote loop
    # (LPA) none of which have a corpus-quadratic stage; the novelty
    # query's gram table grows linearly under the copy-tag perturbation
    "assoc_rules_lift",
    "t_acf_lags",
    "graph_label_propagation",
    "first_seen_novelty",
    # Markov transition matrix: one window pass over 10× more users
    "event_transition_probs",
    # Lloyd trainer: the E-step crossJoin scans 10× vectors per iteration,
    # the M-step moves only (cluster, dim) partial sums — per-iteration
    # linearity is the claim
    "kmeans_lloyd_train",
    # round-8 LM wave: the bigram gate is two corpus passes + Zipf-bounded
    # model joins (copy-tag replicas grow the bigram vocabulary linearly);
    # the unigram EM round trains over DISTINCT words, so 10× corpus with a
    # linearly-grown type vocabulary certifies the per-type E-step never
    # scales with token count
    "bigram_lm_perplexity_gate",
    "unigram_lm_em_round",
    # round-9 wave: pHash hashes one 64-cell expression per doc then a
    # pigeonhole bucket join (copy-tag replicas grow buckets linearly);
    # DoReMi touches the corpus once to build sources×sources integer
    # matrices — rounds are broadcast-sized algebra, so 10× data stresses
    # only the one fan-out MM join. sequence_packing_ffd is deliberately
    # NOT stressed here: the replica harness grows each source shard 10×
    # LONGER (sources are not key-shifted), and FFD is by definition
    # sequential-and-quadratic WITHIN a shard — its scale contract is
    # bounded shard size with more shards (operators/packing.py), which
    # this perturbation cannot represent.
    "image_phash_neardup",
    "doremi_mixture_reweight",
    # round-9 additions: the audio fingerprint is the pHash shape with a
    # per-char explode front (copy-tag replicas shift every fingerprint's
    # frame grid, so buckets grow linearly); boilerplate scrub is one
    # line-keyed distinct-doc count + a broadcast anti join — the
    # corpus-relative threshold scales with n_docs, keeping the
    # boilerplate set proportionate at 10×
    "audio_fp_neardup",
    "boilerplate_line_scrub",
    # WordPiece apply is per-TYPE: 10× corpus under copy-tag perturbation
    # grows the distinct-word vocabulary by only the handful of tag words,
    # so the ratio certifies that segmentation cost tracks types, not
    # tokens. semantic_decontam_select is deliberately NOT stressed: the
    # replica grows BOTH sides of the corpus x eval product (eval anchors
    # are a fixed id-residue slice), so 10× data means 100× pair work by
    # construction — in production the eval set is FIXED and the scan is
    # linear in the corpus; this perturbation cannot represent that.
    "wordpiece_tokenize",
    # Kneser-Ney: two corpus passes + Zipf-bounded broadcast statistics —
    # the ratio certifies the DECIMAL(38,0) rational stays per-row work
    "kneser_ney_score",
    # video pHash: 4x the image-pHash hash work + the per-video-pair vote;
    # copy-tag replicas grow frame buckets linearly like the image twin
    "video_phash_neardup",
    # round-10: intra-doc passage excision — the explode-heaviest of the
    # wave-4 trio; no corpus-wide key at all (two doc-keyed shuffles), so
    # the ratio certifies pure per-document linearity
    "intradoc_dedup",
    # round-11 wave: pii_scrub certifies the regex stack stays map-only at
    # 10× corpus. semdedup_prune is deliberately NOT stressed: its pair
    # work is Σ|cell|², and the jittered replica grows every cell 10×
    # DEEPER (pair work ~100× by construction — measured idle 3.1s → 46s),
    # whereas production growth scales the cell count k with N to keep
    # cell populations flat (operators/semdedup.py docstring; the paper
    # runs ~100k clusters at web scale) — this perturbation cannot
    # represent that, same reasoning as semantic_decontam_select above.
    "pii_scrub",
    # round-12 wave: unicode_scrub certifies the 13-rule regexp cascade
    # stays map-only (zero shuffles) at 10× corpus; domain_quality_gate
    # certifies the single domain-keyed shuffle (count-distinct expand +
    # exact quality sums) and the broadcast blocklist survive the growth
    "unicode_scrub",
    "domain_quality_gate",
    "html_strip",
    # round-13 wave: the composed raw-crawl chain — certifies that the
    # regex cascades stay map-only, the domain shuffle stays linear, and
    # the banded-LSH near-dup stage (candidate mass grows with true-dup
    # mass, linear under the copy-tag perturbation) never goes quadratic
    # through the composition
    "web_curation_e2e",
    # round-14 additions (r13 verdict #3: turn the r13 plan-shape at-scale
    # claims into measured ratios): the flagship prefix-difference windows
    # run over the user-grid (10× MORE users, same grid length — the window
    # term the rewrite targets grows linearly), and corpus_curation's
    # fingerprint-proxy dedup keeps document text out of its exchange (the
    # byte cut is invisible at 1× and priced here)
    "flagship_vertical_analytics",
    "corpus_curation_e2e",
]

#: Tables those queries scan (everything else is derived or dimensional).
TABLES = ["lineitem", "documents", "embeddings", "events", "orders"]

_SHIFT = 10_000_000  # key offset per replica copy: far above any sf0.1 key


def _replicate(spark: SparkSession, src: str, table: str, factor: int) -> DataFrame:
    """Union ``factor`` key-shifted copies of ``table``.

    Content perturbation keeps the data DISTRIBUTION scale-invariant:
    - documents: copy-tag prefixes the text (so near-dup clusters and exact
      window fingerprints grow linearly, not by copy-count multiplicity);
    - embeddings: per-copy additive jitter (semantic-dup candidate mass and
      centroid geometry stay proportionate);
    - events / lineitem: user/order key spaces shift (per-key series keep
      their length, so window frames and group sizes match production shape
      — 10× MORE groups, not 10×-LONGER groups, which is how event data
      actually grows).
    """
    base = spark.read.parquet(f"{src}/{table}.parquet")
    copies = []
    for i in range(factor):
        df = base
        if table == "documents":
            df = df.select(
                (F.col("doc_id") + i * _SHIFT).alias("doc_id"),
                (F.concat(F.lit(f"c{i} "), F.col("text")) if i else F.col("text")).alias("text"),
                "lang",
                "source",
                F.length(F.concat(F.lit(f"c{i} " if i else ""), F.col("text"))).alias("n_chars"),
            )
        elif table == "embeddings":
            df = df.select(
                (F.col("vec_id") + i * _SHIFT).alias("vec_id"),
                F.transform("embedding", lambda x: x + F.lit(float(i) * 1e-3)).alias(
                    "embedding"
                ),
                "label",
            )
        elif table == "events":
            df = df.select(
                (F.col("event_id") + i * _SHIFT).alias("event_id"),
                "ts",
                (F.col("user_id") + i * _SHIFT).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        elif table == "lineitem":
            df = df.withColumn("l_orderkey", F.col("l_orderkey") + i * _SHIFT)
        elif table == "orders":
            # key shift only: the cumulative-weight line gets 10× more
            # points with the same weight distribution (prefix-scan stress)
            df = df.withColumn("o_orderkey", F.col("o_orderkey") + i * _SHIFT)
        copies.append(df)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def build_scaled(spark: SparkSession, src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        path = f"{dst}/{t}.parquet"
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        _replicate(spark, src, t, factor).write.mode("overwrite").parquet(path)


def _time_query(spark: SparkSession, build, sf_dir: str) -> float:
    start = time.perf_counter()
    build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - start


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SCALE_STRESS_FACTOR", "10"))
    scaled = os.environ.get("SCALE_STRESS_DIR", f"/tmp/scale_stress_x{factor}")
    runs = int(os.environ.get("SCALE_STRESS_RUNS", "2"))
    spark = get_spark(app_name="scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"building {factor}x replica at {scaled} ...", flush=True)
    build_scaled(spark, base, scaled, factor)
    for t in TABLES:
        n1 = spark.read.parquet(f"{base}/{t}.parquet").count()
        nx = spark.read.parquet(f"{scaled}/{t}.parquet").count()
        assert nx == factor * n1, (t, n1, nx)
        print(f"  {t}: {n1} -> {nx}", flush=True)

    specs = {s.name: s for s in all_specs()}
    # plan-shape warm-up at tiny SF (mirrors bench.py): charge codegen once
    warm = os.path.join(os.path.dirname(base.rstrip("/")), "sf0.001")
    for name in QUERIES:
        if os.path.isdir(warm):
            specs[name].build(spark, warm).write.format("noop").mode("overwrite").save()

    results = {}
    for name in QUERIES:
        t1 = min(_time_query(spark, specs[name].build, base) for _ in range(runs))
        tx = min(_time_query(spark, specs[name].build, scaled) for _ in range(runs))
        results[name] = {
            "t_1x_sec": round(t1, 3),
            f"t_{factor}x_sec": round(tx, 3),
            "ratio": round(tx / t1, 2),
        }
        print(f"  {name}: {t1:.2f}s -> {tx:.2f}s ({tx / t1:.1f}x)", flush=True)

    print(json.dumps({"factor": factor, "results": results}))
    write_scale_md(base, factor, runs, results)
    spark.stop()


def write_scale_md(base: str, factor: int, runs: int, results: dict) -> None:
    """Render the measured ratios into ``SCALE.md`` at the repo root."""
    lines = [
        "# SCALE — measured scale-stress ratios",
        "",
        f"`python tools_scale_stress.py` at factor **{factor}×** over the",
        f"{len(results)} shuffle-heaviest catalog plans. Base tables: `{base}`;",
        "replicas are",
        "key-shifted + content-perturbed so duplicate mass, group counts, and",
        "candidate-pair counts grow LINEARLY with the factor (naive duplication",
        "would square true-duplicate mass — see `_replicate` docstring).",
        f"Timings are the best of {runs} runs, plans warmed at sf0.001 first;",
        "sink is the `noop` format, so the numbers are pure compute+shuffle.",
        "",
        "A ratio near the factor (or below — constant-cost amortization) means",
        f"the plan scales linearly; a blow-up ≫ {factor + 2}× would flag an AQE",
        "plan-flip (broadcast side outgrowing the threshold into a BNLJ) or",
        "quadratic candidate growth.",
        "",
        f"| query | t(1×) s | t({factor}×) s | ratio |",
        "|---|---|---|---|",
    ]
    for name, r in results.items():
        lines.append(
            f"| {name} | {r['t_1x_sec']} | {r[f't_{factor}x_sec']} | "
            f"{r['ratio']}× |"
        )
    worst = max(r["ratio"] for r in results.values())
    lines += [
        "",
        f"Worst ratio: **{worst}×** (linear-scaling budget: ≲ {factor + 2}×).",
        "",
        "Ratios well below the factor — including < 1× — mean the plan is",
        "still fixed-cost-dominated (scheduler, codegen, exchange setup) at",
        "this absolute size, i.e. the data term hasn't yet overtaken the",
        "constant term; what the budget above guards against is the opposite",
        "tail, a super-linear blow-up from a plan-flip or quadratic",
        "candidate growth.",
        "",
        "```json",
        json.dumps({"factor": factor, "runs": runs, "results": results}),
        "```",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALE.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
