"""MinHash estimator quality: on documents with KNOWN shingle overlap, the
signature-agreement estimate must track true Jaccard (the evidence behind the
rows-only minhash catalog entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.dedup import (
    jaccard,
    minhash_lsh_candidates,
    with_shingles,
)


def _doc(words: list[str]) -> str:
    return " ".join(words)


def test_minhash_estimates_track_true_jaccard(spark):
    vocab = [f"w{i}" for i in range(120)]
    # pairs engineered at high/medium/low overlap (unigram-ish via 2-gram chain)
    docs = [
        (1, _doc(vocab[0:100])),
        (2, _doc(vocab[0:95] + vocab[100:105])),   # ~high overlap with 1
        (3, _doc(vocab[0:50] + vocab[60:110])),    # ~medium overlap with 1
        (4, _doc(vocab[60:120] + vocab[0:5])),     # low overlap with 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # true pairwise bigram jaccard
    sh = with_shingles(df, "text", 2)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("grams").alias("a"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("grams").alias("b"))
    truth = {
        (r["a_id"], r["b_id"]): r["jac"]
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", jaccard(F.col("a"), F.col("b")).alias("jac"))
        .collect()
    }

    # high-k minhash so the estimator variance is tight; bands=k makes every
    # band a single signature row, so any agreement yields a candidate pair —
    # we're testing estimation here, not LSH selectivity
    cands = minhash_lsh_candidates(df, ngram=2, k=128, bands=128)
    est = {(r["a_id"], r["b_id"]): r["est_jaccard"] for r in cands.collect()}

    pair_hi, pair_lo = (1, 2), (1, 4)
    assert abs(est[pair_hi] - truth[pair_hi]) < 0.15
    assert abs(est[pair_lo] - truth[pair_lo]) < 0.15
    # ordering preserved: the estimator ranks high-overlap above low-overlap
    assert est[pair_hi] > est[(1, 3)] > est[pair_lo]


def test_simhash_separates_near_from_far(spark):
    from schwab_elt_etl_pipeline_spark.operators.dedup import simhash_near_dups

    base = " ".join(f"tok{i}" for i in range(200))
    near = " ".join(f"tok{i}" for i in range(197)) + " tokA tokB tokC"
    far = " ".join(f"zzz{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    # wide bucket (prefix 1 bit) so candidate generation can't mask distance
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in simhash_near_dups(df, max_hamming=64, prefix_bits=1).collect()
    }
    near_d = pairs.get((1, 2), 64)
    far_d = pairs.get((1, 3), pairs.get((2, 3), 64))
    assert near_d <= 8, f"near-dup hamming too high: {near_d}"
    assert near_d < far_d, f"simhash failed to separate: near={near_d} far={far_d}"


def test_lsh_banding_finds_near_duplicates(spark):
    base = " ".join(f"tok{i}" for i in range(200))
    near = " ".join(f"tok{i}" for i in range(198)) + " tokX tokY"  # ~99% same
    far = " ".join(f"other{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    cands = minhash_lsh_candidates(df, ngram=2, k=32, bands=8)
    pairs = {(r["a_id"], r["b_id"]): r["est_jaccard"] for r in cands.collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.8  # near-dup surfaces
    assert (1, 3) not in pairs  # unrelated doc never shares a band bucket


def test_simhash_pigeonhole_guarantee(spark, sf_dir):
    """Pigeonhole blocking with B blocks MUST emit every pair at Hamming
    distance ≤ B-1 — a deterministic guarantee, checked against all-pairs."""
    from schwab_elt_etl_pipeline_spark.operators.dedup import (
        simhash64,
        simhash_block_candidates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    blocks = 10
    sigs = docs.select(F.col("doc_id").alias("id"), simhash64("text").alias("sig"))
    a, b = sigs.alias("a"), sigs.alias("b")
    truth = {
        (r["a_id"], r["b_id"])
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("h"),
        )
        .filter(F.col("h") <= blocks - 1)
        .collect()
    }
    cands = {
        (r["a_id"], r["b_id"])
        for r in simhash_block_candidates(docs, blocks=blocks).collect()
    }
    assert truth <= cands, f"missed guaranteed pairs: {sorted(truth - cands)[:5]}"


def test_verified_pairs_match_bruteforce(spark):
    """LSH-then-verify output equals brute-force exact Jaccard ≥ tau on a
    corpus with engineered dup structure (recall certification in-miniature)."""
    from schwab_elt_etl_pipeline_spark.operators.dedup import (
        minhash_verified_pairs,
        simhash_verified_pairs,
    )

    rows = []
    for g in range(6):
        base = [f"g{g}w{i}" for i in range(80)]
        rows.append((g * 10, " ".join(base)))
        rows.append((g * 10 + 1, " ".join(base[:76] + [f"g{g}x{i}" for i in range(4)])))
    rows.append((999, " ".join(f"solo{i}" for i in range(80))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = with_shingles(df, "text", 2)
    a = sh.select(F.col("doc_id").alias("a_id"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("b_id"), F.col("grams").alias("gb"))
    truth = {
        (r["a_id"], r["b_id"])
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", jaccard(F.col("ga"), F.col("gb")).alias("jac"))
        .filter(F.col("jac") >= 0.5)
        .collect()
    }
    assert len(truth) == 6  # one high-jac pair per group
    mh = {(r["a_id"], r["b_id"]) for r in minhash_verified_pairs(df, tau=0.5).collect()}
    sh_ = {(r["a_id"], r["b_id"]) for r in simhash_verified_pairs(df, tau=0.5).collect()}
    assert mh == truth
    assert sh_ == truth
