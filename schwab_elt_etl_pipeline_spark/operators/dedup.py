"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Designed for the 100 TB regime:

- exact: one hash-shuffle on the fingerprint — embarrassingly scalable.
- n-gram Jaccard: exact pairwise similarity, restricted to candidate pairs
  (banded or LSH-bucketed) — never all-pairs.
- MinHash+LSH: signatures are per-row map work; candidate generation is a
  groupBy on (band, band-hash) buckets — the only shuffle — followed by
  within-bucket pairing. All-pairs never materializes.
- SimHash: 64-bit signature per row; near-dup = small Hamming distance,
  bucketed by signature prefix.

Everything is built-in expressions (xxhash64 / array lambdas); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.text import fingerprint


def ngrams_over_tokens(toks: Column, n: int) -> Column:
    """Distinct n-gram shingles over an ALREADY-MATERIALIZED token array
    column. ``toks`` must be a bound attribute (e.g. added via
    ``withColumn``), not a raw ``split(...)`` expression — Spark does not
    hoist invariant sub-expressions out of higher-order-function lambdas, so
    an inline split would re-tokenize per element: O(tokens²) per document.

    Guard: ``sequence(0, negative)`` counts DOWN in Spark, so short docs
    explicitly get an empty shingle set.
    """
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def with_shingles(
    df: DataFrame, text_col: str = "text", n: int = 2, out: str = "grams"
) -> DataFrame:
    """Attach distinct word n-gram shingles of casefolded text as ``out``.

    Two projection steps so the regex tokenization runs exactly once per row.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.withColumn("_toks", toks)
        .withColumn(out, ngrams_over_tokens(F.col("_toks"), n))
        .drop("_toks")
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint: one row per
    group with the kept (minimum) id and the duplicate count."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two distinct-element arrays as a single
    deterministic double division."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / union


def minhash_signature(shingles_col: str, k: int = 32) -> Column:
    """k-permutation MinHash signature: per hash seed i, the min of
    ``xxhash64(i, shingle)`` over the row's shingle set.

    Built as SQL expressions on a NAMED column: the Python-lambda HOF API
    collapses structurally-similar lambdas that differ only in an embedded
    literal (all k seeds evaluated as one — degenerate signatures; caught by
    tests/test_minhash_accuracy.py). SQL-parsed lambdas keep each seed.
    """
    return F.array(
        *[
            F.expr(f"array_min(transform({shingles_col}, s -> xxhash64({i}, s)))")
            for i in range(k)
        ]
    )


def _banded_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ngram: int,
    k: int,
    bands: int,
) -> DataFrame:
    """(id, sig, band, bucket) rows: one row per (document, LSH band), where
    ``bucket`` hashes that band's signature slice. Shared by the self-join
    (near-dup) and cross-table (decontamination) candidate generators."""
    rows_per_band = k // bands
    sigs = with_shingles(df, text_col, ngram, out="_grams").select(
        F.col(id_col).alias("id"),
        minhash_signature("_grams", k).alias("sig"),
    )
    return sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")


def minhash_cross_candidates(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Cross-table banded-LSH candidates: (left_id, right_id, est_jaccard)
    for left/right rows sharing any band bucket. The join is an equi-join on
    (band, bucket) — when ``right`` is an eval/benchmark set it is orders of
    magnitude smaller than the corpus, so Spark broadcasts it and the corpus
    never shuffles (the decontamination scale path)."""
    a = _banded_signatures(left, id_col, text_col, ngram, k, bands).alias("a")
    b = _banded_signatures(right, id_col, text_col, ngram, k, bands).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.id").alias("left_id"),
            F.col("b.id").alias("right_id"),
            (
                F.size(
                    F.filter(
                        F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
                        lambda v: v == 1,
                    )
                )
                / F.lit(k)
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    k: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash-LSH.

    Rows whose signatures agree on ALL rows of any band land in the same
    bucket; within-bucket self-join emits (a_id, b_id, est_jaccard) with
    est_jaccard = fraction of agreeing signature positions. a_id < b_id.
    """
    banded = _banded_signatures(df, id_col, text_col, ngram, k, bands)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            (
                F.size(
                    F.filter(
                        F.zip_with("a.sig", "b.sig", lambda x, y: (x == y).cast("int")),
                        lambda v: v == 1,
                    )
                )
                / F.lit(k)
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs


def _verify_pairs_exact(cands: DataFrame, sh: DataFrame, tau: float) -> DataFrame:
    """Join candidate pairs back to their shingle sets and keep those whose
    EXACT Jaccard ≥ tau. Candidates are a tiny fraction of all-pairs, so the
    two id-equi-joins are cheap; shingle arrays never ride through the LSH
    bucket shuffle."""
    a = sh.select(F.col("id").alias("a_id"), F.col("grams").alias("a_grams"))
    b = sh.select(F.col("id").alias("b_id"), F.col("grams").alias("b_grams"))
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(jaccard(F.col("a_grams"), F.col("b_grams")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= tau)
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    k: int = 32,
    bands: int = 16,
    tau: float = 0.5,
) -> DataFrame:
    """LSH-then-verify near-duplicate detection — the production MinHash
    pipeline shape: banded LSH proposes candidates (the only shuffle is the
    groupBy-shaped bucket join), then exact Jaccard over the candidates is the
    final verdict. Output: ``(a_id, b_id, jac)`` with exact jac ≥ tau.

    The output equals brute-force all-pairs exact Jaccard ≥ tau PROVIDED the
    LSH stage recalls every true pair. With r = k/bands rows per band, a pair
    at similarity j is missed with probability (1 - j^r)^bands — at j = 0.9,
    r = 2, bands = 16 that is ~3e-12. This is what makes the query
    SQL-oracle-checkable: the DuckDB oracle computes brute-force exact
    Jaccard, so a hash match CERTIFIES end-to-end recall on the data — a
    strictly stronger check than a rows-only gate.
    """
    sh = with_shingles(df, text_col, ngram, out="grams").select(
        F.col(id_col).alias("id"), "grams"
    )
    cands = minhash_lsh_candidates(
        df, id_col=id_col, text_col=text_col, ngram=ngram, k=k, bands=bands
    ).select("a_id", "b_id")
    return _verify_pairs_exact(cands, sh, tau)


def simhash_blocked(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 8,
) -> DataFrame:
    """Pigeonhole-blocked SimHash rows ``(id, sig, block, key)``: the 64-bit
    signature cut into ``blocks`` contiguous bit-chunks, one row per chunk.

    The bucketable form shared by the batch candidate join
    (:func:`simhash_block_candidates`) and the streaming incremental index
    (streaming/corpus.py ``update_simhash_index``) — both probe on the
    ``(block, key)`` equi-key, so recall guarantees are identical.
    """
    sigs = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sig"))
    base, rem = divmod(64, blocks)
    chunks, start = [], 0
    for bk in range(blocks):
        w = base + (1 if bk < rem else 0)
        chunks.append(
            F.struct(
                F.lit(bk).alias("block"),
                F.shiftrightunsigned("sig", start)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("key"),
            )
        )
        start += w
    return sigs.select(
        "id", "sig", F.explode(F.array(*chunks)).alias("bb")
    ).select("id", "sig", "bb.block", "bb.key")


def simhash_block_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 8,
) -> DataFrame:
    """Pigeonhole-blocked SimHash candidate pairs: the 64-bit signature is cut
    into ``blocks`` contiguous bit-chunks and rows bucket by (chunk-index,
    chunk-value); a pair collides when ANY chunk matches exactly.

    Pigeonhole guarantee: a pair with Hamming distance ≤ blocks-1 cannot
    differ in every chunk, so recall is 1.0 (deterministic, not
    probabilistic) for distances up to blocks-1. More blocks ⇒ larger
    guaranteed radius but looser buckets (each chunk has 64/blocks bits of
    selectivity) — the classic pigeonhole/HmSearch trade-off. The only
    shuffle is the bucket equi-join; all-pairs never materializes.

    Output: ``(a_id, b_id, hamming)`` deduplicated across blocks.
    """
    banded = simhash_blocked(df, id_col=id_col, text_col=text_col, blocks=blocks)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )


def simhash_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 2,
    blocks: int = 10,
    tau: float = 0.5,
) -> DataFrame:
    """SimHash-then-verify near-duplicate detection: pigeonhole-blocked
    SimHash candidates (guaranteed recall for Hamming ≤ blocks-1), then exact
    Jaccard over candidates as the verdict. Output ``(a_id, b_id, jac)`` with
    exact jac ≥ tau — SQL-oracle-checkable against brute-force exact Jaccard
    exactly like :func:`minhash_verified_pairs`. Candidates are NOT
    Hamming-pruned before verification: pruning could drop a high-Jaccard
    pair outside the guaranteed radius that a lucky block collision caught.
    """
    sh = with_shingles(df, text_col, ngram, out="grams").select(
        F.col(id_col).alias("id"), "grams"
    )
    cands = simhash_block_candidates(
        df, id_col=id_col, text_col=text_col, blocks=blocks
    ).select("a_id", "b_id")
    return _verify_pairs_exact(cands, sh, tau)


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair graph → ``(node, comp)``
    with ``comp`` = the minimum node id in the component.

    This is the step after candidate generation (MinHash/SimHash/Jaccard
    pairs) that turns PAIRS into CLUSTERS so each group keeps one canonical
    document — without it a dedup pass drops A~B and B~C but keeps A and C.

    Distributed shape: iterative min-label propagation with one
    pointer-jumping step per round (``comp ← label(comp)``), so convergence
    is O(log diameter) rounds rather than O(diameter). Each round is two
    hash-joins + a groupBy on the node key; ``localCheckpoint`` truncates
    lineage so plans stay flat across iterations. Terminates early via a
    cheap changed-row probe.
    """
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("t")))
        .distinct()
        .localCheckpoint()
    )
    # initial labels fold the FIRST propagation round into the node-set
    # build: comp₀ = min(node, min neighbor) is exactly what round 1's hook
    # would compute from identity labels, for the cost of the groupBy that
    # derives the node set anyway — one fewer loop round on every graph
    labels = (
        und.groupBy(F.col("s").alias("node"))
        .agg(F.min("t").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("comp"))
    )
    for _ in range(max_iter):
        neigh = (
            und.join(labels, und.t == labels.node)
            .groupBy("s")
            .agg(F.min("comp").alias("ncomp"))
        )
        hooked = labels.join(neigh, labels.node == neigh.s, "left").select(
            "node",
            F.least("comp", F.coalesce("ncomp", F.col("comp"))).alias("comp"),
            F.col("comp").alias("prev"),  # ride the old label along: the
            # convergence probe below then needs no join back to `labels`
        )
        # pointer jump: comp is always itself a node, so chase one level
        ptr = hooked.select(F.col("node").alias("p_node"), F.col("comp").alias("p_comp"))
        # lazy checkpoint + probe in ONE action: the unlimited count scans
        # every partition, so it fully materializes the round's labels
        # (truncating lineage) and reads the convergence flag from the same
        # job — an eager checkpoint would pay a second full pass per round,
        # and a limit(1) probe could stop early and leave the checkpoint
        # partially materialized (lineage regrowth across rounds)
        jumped = (
            hooked.join(ptr, hooked.comp == ptr.p_node, "left")
            .select(
                "node",
                F.least("comp", F.coalesce("p_comp", F.col("comp"))).alias("comp"),
                "prev",
            )
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter("comp <> prev").count()
        labels = jumped.select("node", "comp")
        if changed == 0:
            break
    return labels


def simhash64(text_col: str) -> Column:
    """64-bit SimHash over whitespace tokens: bit b is set when the sum of
    ±1 votes (token-hash bit b) is positive."""
    toks = f"split(trim(lower({text_col})), '\\\\s+')"
    votes = (
        f"aggregate({toks}, "
        f"array_repeat(0, 64), "
        f"(acc, t) -> zip_with(acc, transform(sequence(0, 63), "
        f"b -> CASE WHEN (shiftright(xxhash64(t), b) & 1) = 1 THEN 1 ELSE -1 END), "
        f"(x, y) -> x + y))"
    )
    bits = (
        f"aggregate(zip_with({votes}, sequence(0, 63), "
        f"(v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END), "
        f"0L, (acc, x) -> acc | x)"
    )
    return F.expr(bits)


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: bucket on the signature's top
    ``prefix_bits`` (scale path — identical prefixes shuffle together), then
    exact Hamming distance within buckets."""
    sigs = df.select(
        F.col(id_col).alias("id"),
        simhash64(text_col).alias("sig"),
    ).withColumn("bucket", F.shiftrightunsigned("sig", 64 - prefix_bits))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def split_passages(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passage_tokens: int = 50,
) -> DataFrame:
    """(_id, passage_id, passage): non-overlapping ``passage_tokens``-token
    passages per document — THE passage definition. Batch dedup
    (:func:`passage_dedup_rebuild`) and the incremental streaming index
    (``streaming/corpus.py update_passage_index``) both call this, so the
    boundary/normalization rule cannot silently diverge between the paths
    the tests assert equal."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        docs.withColumn("_toks", toks)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.sequence(F.lit(1), F.size("_toks"), F.lit(passage_tokens))
            ).alias("start"),
            "_toks",
        )
        .select(
            "_id",
            ((F.col("start") - 1) / passage_tokens).cast("int").alias("passage_id"),
            F.array_join(F.slice("_toks", F.col("start"), passage_tokens), " ").alias(
                "passage"
            ),
        )
    )


def passage_dedup_rebuild(
    docs: DataFrame,
    passage_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sub-document exact dedup with text rebuild (RefinedWeb/Gopher-style).

    Splits each document into non-overlapping ``passage_tokens``-token
    passages, keeps only the FIRST corpus-wide occurrence of each passage
    (ordered by id then position), and reassembles each document from its
    surviving passages. Output: (id, n_passages, n_kept, deduped_text).

    One explode + one passage-keyed shuffle (first-occurrence window) + one
    id-keyed shuffle (reassembly). At 100 TB the window key would be a
    128-bit passage fingerprint so the wide text column shuffles once, not
    twice; the raw-text key here keeps the rule exact and oracle-checkable.
    """
    from pyspark.sql.window import Window

    passages = split_passages(docs, id_col, text_col, passage_tokens)
    w = Window.partitionBy("passage").orderBy("_id", "passage_id")
    ranked = passages.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.count(F.when(F.col("rk") == 1, 1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rk") == 1,
                                F.struct("passage_id", "passage"),
                            )
                        )
                    ),
                    lambda x: x["passage"],
                ),
                " ",
            ).alias("deduped_text"),
        )
        .withColumnRenamed("_id", id_col)
    )


def intradoc_dedup_rebuild(
    docs: DataFrame,
    passage_tokens: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WITHIN-document repeated-passage excision with text rebuild — the
    self-repetition scrub (the removal counterpart of the Gopher
    repetition *metrics* in ``operators/curation.py repetition_stats``):
    a passage that recurs inside the SAME document keeps its first
    occurrence and loses the repeats, while cross-document repeats are
    untouched (that's :func:`passage_dedup_rebuild`'s job — the two
    compose, sharing :func:`split_passages` so the passage rule can't
    diverge).

    Output: (id, n_passages, n_kept, deduped_text). No window function:
    first-occurrence-within-doc is a groupBy (id, passage) min(position),
    so the shape is two doc-keyed shuffles — embarrassingly linear, no
    corpus-wide key to skew, safe at any scale.
    """
    passages = split_passages(docs, id_col, text_col, passage_tokens)
    firsts = passages.groupBy("_id", "passage").agg(
        F.min("passage_id").alias("passage_id")
    )
    totals = passages.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_passages")
    )
    rebuilt = firsts.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("passage_id", "passage"))),
                lambda x: x["passage"],
            ),
            " ",
        ).alias("deduped_text"),
    )
    return (
        totals.join(rebuilt, "_id")
        .withColumnRenamed("_id", id_col)
        .select(id_col, "n_passages", "n_kept", "deduped_text")
    )


def substring_dedup_rebuild(
    docs: DataFrame,
    window_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_key: bool = False,
) -> DataFrame:
    """Substring-granular exact dedup with text rebuild (the token-window
    form of ExactSubstr dedup, Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better").

    Every OVERLAPPING ``window_tokens``-token window (stride 1) is ranked by
    corpus-wide first occurrence (doc_id, then position). A window occurrence
    with rank > 1 marks all its tokens as duplicated; any shared span of
    >= window_tokens tokens is caught in full (a length-m copy yields
    m-k+1 duplicate windows covering exactly the span), while the span's
    first corpus-wide occurrence survives. Marked tokens are excised and the
    remaining tokens reassemble in order. Unlike :func:`passage_dedup_rebuild`
    this is boundary-free: a duplicated span is removed wherever it starts.

    Output: (id, n_tokens, n_dropped, deduped_text).

    Shape: one explode to n windows/doc, one hash shuffle on the window text
    for the first-occurrence ranking, an equi-join of duplicate starts back
    onto token positions, then ONE doc-keyed sort (the running-coverage
    window and the rebuild groupBy share the exchange). Span-merge needs no
    pairwise interval logic: a token is dropped iff the running max of
    (dup_start + k - 1) at its position covers it — an O(n) sweep per doc.
    ``fingerprint_key=True`` is the scale path: the ranking shuffle is keyed
    on ``xxhash64`` of the window text, so the stride-1 blow-up moves 8
    bytes per window instead of k tokens of text (collision odds at 64 bits
    are negligible against corpus sizes; a cautious deployment widens to two
    independent hashes). The default raw-text key keeps the rule exact and
    oracle-checkable, exactly as in :func:`passage_dedup_rebuild`. Under an
    extreme hot key (one boilerplate span repeated millions of times) the
    per-key ``row_number`` sort is the straggler; the skew-safe form ranks
    nothing — the winner is the map-side-combinable ``min(struct(id, start))``
    per key and every other occurrence is a duplicate via equi-join.
    """
    from pyspark.sql.window import Window

    k = window_tokens
    tokens, wins = doc_tokens_and_windows(docs, k, id_col, text_col)
    if fingerprint_key:
        wins = wins.select("_id", "start", F.xxhash64("wtext").alias("wtext"))
    first = Window.partitionBy("wtext").orderBy("_id", "start")
    dup_starts = (
        wins.withColumn("rk", F.row_number().over(first))
        .filter(F.col("rk") > 1)
        .select("_id", "start")
    )
    return excise_and_rebuild(tokens, dup_starts, k, id_col)


def doc_tokens_and_windows(
    docs: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Shared substring-dedup front end: ``tokens`` = (_id, pos, token) with
    1-based positions; ``wins`` = (_id, start, wtext) stride-1 k-token
    windows (docs shorter than k yield no windows — ``sequence(1, n-k+1)``
    would DESCEND for them, hence the filter-first guard). One definition so
    the batch operator and the streaming index
    (``streaming/corpus.py update_window_index``) cannot drift."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_toks"),
    )
    tokens = toks.select(
        "_id", F.posexplode("_toks").alias("pos0", "token")
    ).select("_id", (F.col("pos0") + 1).alias("pos"), "token")
    wins = (
        toks.filter(F.size("_toks") >= k)
        .select(
            "_id",
            F.explode(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(k - 1))
            ).alias("start"),
            "_toks",
        )
        .select(
            "_id",
            "start",
            F.array_join(F.slice("_toks", F.col("start"), k), " ").alias("wtext"),
        )
    )
    return tokens, wins


def excise_and_rebuild(
    tokens: DataFrame,
    dup_starts: DataFrame,
    k: int,
    id_col: str = "doc_id",
    sep: str = " ",
) -> DataFrame:
    """Shared substring-dedup back end: mark every token covered by a
    duplicate k-window start (running-coverage sweep — O(n) per doc, no
    pairwise interval logic) and rebuild each doc from the survivors.
    ``dup_starts`` carries (_id, start). Output:
    (id, n_tokens, n_dropped, deduped_text). ``sep`` is the rebuild
    separator — " " for token streams, "" when the "tokens" are single
    characters (:func:`dup_char_excise_rebuild`)."""
    from pyspark.sql.window import Window

    dup = dup_starts.select(
        "_id", F.col("start").alias("pos"), F.lit(1).alias("_dup")
    )
    sweep = Window.partitionBy("_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    marked = tokens.join(dup, ["_id", "pos"], "left").withColumn(
        "_cover_end",
        F.max(F.when(F.col("_dup") == 1, F.col("pos") + F.lit(k - 1))).over(sweep),
    )
    dropped = F.col("_cover_end") >= F.col("pos")
    return (
        marked.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.coalesce(
                F.sum(F.when(dropped, 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~dropped | dropped.isNull(), F.struct("pos", "token"))
                        )
                    ),
                    lambda x: x["token"],
                ),
                sep,
            ).alias("deduped_text"),
        )
        .withColumnRenamed("_id", id_col)
    )


def dup_char_spans(
    docs: DataFrame,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-exact duplicate-span finder — the character-granular ExactSubstr
    semantics of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), which that paper computes with a suffix array.
    The distributed equivalent used here is L-gram seed-and-merge: a
    substring of length >= L occurs twice in the corpus iff EVERY one of its
    stride-1 L-character windows occurs twice, so (1) enumerate all L-char
    windows, (2) keep windows whose exact text occurs >= 2 times corpus-wide
    (within- OR cross-document — both are duplication), (3) per document,
    union the surviving [pos, pos+L-1] intervals into maximal spans (the
    removal mask a dedup pass would excise). The span set is identical to
    what a suffix-array scan emits for threshold L, without ever building a
    global ordered structure — suffix arrays don't distribute; hash shuffles
    do. Complements :func:`substring_dedup_rebuild`, which is
    token-granular and rebuilds text; this one is character-granular and
    emits the spans themselves.

    Scale shape (100 TB): the stride-1 blow-up is O(total chars) rows, but
    the corpus-wide counting shuffle is keyed on ``xxhash64(gram)`` — 8
    bytes per window, same discipline as ``fingerprint_key`` in the
    token-window form. Byte-exactness is preserved by a SECOND pass on the
    raw gram text restricted to hash-hot candidates only (the duplicated
    minority) — a window count partitioned on the gram, so a 64-bit
    collision can admit a candidate but never a false span. The final
    interval union is one doc-keyed sort with an O(n) lag sweep — no
    pairwise interval logic.

    Output: (id, span_start, span_end, span_len, n_windows), 1-based
    inclusive character positions; span_len = span_end - span_start + 1;
    n_windows = duplicated L-windows merged into the span. Overlapping and
    adjacent intervals merge (a removal mask has no use for a zero-gap
    boundary between two excised regions).

    Reference parity: the reference has no substring dedup at all — this is
    part of the LLM-pipeline extension family (SURVEY.md "beyond the
    reference" scope).
    """
    from pyspark.sql.window import Window

    L = min_len
    cand = _hot_char_window_candidates(docs, L, id_col, text_col)
    # Pass 2 — exact confirmation over the candidate minority: a window
    # COUNT partitioned on the raw gram text, so a hash collision cannot
    # fabricate a duplicate. One shuffle of cand keyed on the gram; the
    # former agg + semi-join shape paid that shuffle TWICE and re-derived
    # cand for the probe side (the r10 worst scale ratio — profiled, the
    # two gram-text exchanges dominated the 10× adversarial regime).
    # partition by (gh, gram), not gram alone — identical semantics (gh is
    # a pure function of the gram), but the window sort compares the 8-byte
    # hash first and touches string bytes only on gh-ties. Hot-key caveat
    # (same as the excise row_number): a boilerplate gram repeated millions
    # of times lands every occurrence in one window partition — the
    # straggler is bounded by the hottest gram. The skew-safe variant for a
    # measured mega-gram is a map-side-combinable
    # groupBy(gh, gram).count() on a checkpointed cand joined back to it
    # (counts exchange one row per distinct gram), mirroring the excise
    # min(struct(id, pos)) escape hatch.
    w_g = Window.partitionBy("gh", "gram")
    dup = (
        cand.withColumn("_c", F.count(F.lit(1)).over(w_g))
        .filter(F.col("_c") >= 2)
        .select("_id", "pos")
    )
    # Interval union: [pos, pos+L-1] windows, sorted per doc; a window opens
    # a new span iff it clears the previous window's reach (pos > prev+L
    # covers both overlap and zero-gap adjacency, since ends are monotone
    # in pos for fixed L).
    w = Window.partitionBy("_id").orderBy("pos")
    flagged = dup.withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + F.lit(L)),
            1,
        ).otherwise(0),
    )
    isl = flagged.withColumn("_isl", F.sum("_new").over(w))
    return (
        isl.groupBy("_id", "_isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(L - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("_id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_windows",
        )
    )


def _hot_char_window_candidates(
    docs: DataFrame, L: int, id_col: str, text_col: str, via: str = "window"
) -> DataFrame:
    """Shared char-granular front end for :func:`dup_char_spans` and
    :func:`dup_char_excise_rebuild`: (_id, pos, gram, gh) for every stride-1
    L-char window whose text occurs >= 2 times corpus-wide. Two-pass
    discipline, and NO shuffle in it ever carries gram text — pass 1 keeps
    windows whose 8-byte ``xxhash64`` key occurs >= 2 times corpus-wide,
    over (_id, pos, gh) rows only (24 bytes/window), and survivors get
    their gram RECOMPUTED by joining the hot positions back to the doc
    text — a shuffle of O(corpus bytes + hot positions), not O(L x corpus)
    window text. The caller then does exact confirmation over the hash-hot
    minority.

    ``via`` picks the hash-prefilter shape — both respect the no-text-in-
    shuffle discipline:

    - ``"window"`` (default, BOTH callers since r13): ONE count window
      partitioned on ``gh``. The explode + per-window-hash subtree is
      computed once and the corpus-size rows cross one 24-byte exchange,
      at the price of a per-partition sort on the hash. Interleaved idle
      10x measurements: spans front 6.3 s -> 4.0 s (r12), excise front
      ~9.5-14 s (agg) -> ~3-5 s (window) (r13).
    - ``"agg"``: map-side-combinable ``groupBy(gh).count`` + semi-join.
      The explode subtree is referenced on both semi-join sides (computed
      twice) and the partial counts pay a near-full-size 16-byte exchange
      (stride-1 grams rarely repeat within a map partition), BUT the hot-
      hash set broadcasts whenever it fits, so the probe side streams
      with NO exchange and NO sort. Kept as the escape hatch for inputs
      where the hot-hash set is a small fraction of the corpus (real web
      data, vs the adversarial replica where every window is hot) — there
      the broadcast semi-join prunes before any exchange. The r12
      measurement that favored it for the excise consumer (6.0 s vs
      7.6 s) did not reproduce on the r13 regen; re-measure per corpus
      shape if in doubt.

    Hot-key caveat (same as the callers' (gh, gram) stages): a boilerplate
    gram repeated millions of times lands every occurrence in one window
    partition / one semi-join partition; identical exposure in both
    shapes — the skew-safe escape hatch for a measured mega-gram is the
    callers' documented min/max-aggregation variants."""
    from pyspark.sql.window import Window

    base = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).filter(F.length("_t") >= L)
    # sequence(1, n) DESCENDS for n < 1 — the length filter above guards it.
    probes = base.select(
        "_id",
        F.explode(F.sequence(F.lit(1), F.length("_t") - F.lit(L - 1))).alias("pos"),
        "_t",
    ).select(
        "_id",
        "pos",
        F.xxhash64(F.col("_t").substr(F.col("pos"), F.lit(L))).alias("gh"),
    )
    if via == "window":
        hot_pos = (
            probes.withColumn(
                "_c", F.count(F.lit(1)).over(Window.partitionBy("gh"))
            )
            .filter(F.col("_c") >= 2)
            .drop("_c")
        )
    else:
        hot_hashes = (
            probes.groupBy("gh")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") >= 2)
            .select("gh")
        )
        hot_pos = probes.join(hot_hashes, "gh", "semi")
    return hot_pos.join(base, "_id").select(
        "_id",
        "pos",
        F.col("_t").substr(F.col("pos"), F.lit(L)).alias("gram"),
        "gh",
    )


def dup_char_excise_rebuild(
    docs: DataFrame,
    min_len: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Character-granular ExactSubstr dedup WITH the Lee et al. removal
    policy applied: the corpus-wide FIRST occurrence (by id, then position)
    of every duplicated >= L-char substring survives; every later
    occurrence's characters are excised and documents rebuild from the
    surviving characters. The actionable twin of :func:`dup_char_spans`
    (which emits the duplication map over ALL occurrences) and the
    character-granular twin of :func:`substring_dedup_rebuild` (token
    windows, space-separated rebuild).

    Shape: the shared two-pass front end keeps the corpus-wide count
    shuffle at 8 bytes/window; only hash-hot candidates carry gram text
    into the exact first-occurrence selection (UNORDERED window min of
    struct(id, pos) per (gh, gram) — byte-exact, a 64-bit collision cannot
    merge two distinct grams, and the partition-only sort skips the
    (id, pos) order a row_number would pay). Excision then stays at SPAN
    granularity end to
    end: later-occurrence starts merge into disjoint [start, start+L-1]
    spans per doc (the same O(n) lag sweep as :func:`dup_char_spans` —
    ends are monotone in start for fixed L), and each doc rebuilds with ONE
    array fold over its ≤(len/L)-entry span list — ``substr`` the gaps,
    sum the span lengths. The former shape delegated to
    :func:`excise_and_rebuild` with characters as tokens, which exploded
    every character into a row, joined, swept, and re-agglomerated them:
    O(corpus chars) rows through three wide ops just to delete spans it
    already knew (the r10 worst scale ratio — rewritten r11, 8.3× → ~4×
    @10× adversarial; the r13 window-front + unordered-min rewrite took
    the 10× stage time from ~12 s to ~4 s). The token form keeps the
    shared back end: its rebuild genuinely re-separates tokens. Same
    hot-key caveat as the token form: a boilerplate gram repeated millions
    of times lands every occurrence in one window partition; the
    skew-safe escape hatch is the same min(struct) as a map-side-
    combinable groupBy(gh, gram) aggregation joined back to ``cand``.

    Output: (id, n_chars, n_dropped, deduped_text) — counts in characters.
    Docs shorter than L pass through whole; empty docs yield no rows (no
    characters to keep or drop), matching the SQL oracle's UNNEST
    semantics.
    """
    from pyspark.sql.window import Window

    L = min_len
    base = docs.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_t")
    ).filter(F.length("_t") >= 1)
    # via="window" + UNORDERED min(struct) window (re-measured r13, idle
    # 10x adversarial): the former agg front + (gh, gram) row_number read
    # 11.3-12.7 s; this shape reads 3.5-4.8 s. Two wins compound: the
    # window front end computes the explode subtree once and ships one
    # 24-byte exchange (the agg form references it on both semi-join
    # sides), and the unordered window needs only the partition-key sort —
    # no (_id, pos) order — to take min(struct(_id, pos)) per exact gram.
    cand = _hot_char_window_candidates(docs, L, id_col, text_col, via="window")
    # first occurrence = lexicographic min of (_id, pos) per byte-exact
    # gram — identical verdicts to rank-and-keep-first, without the
    # order-by. (gh, gram) partitioning: hash-first sort, string bytes
    # only on gh-ties.
    w_first = Window.partitionBy("gh", "gram")
    dup_starts = (
        cand.withColumn("_f", F.min(F.struct("_id", "pos")).over(w_first))
        .filter(
            (F.col("_id") != F.col("_f._id")) | (F.col("pos") != F.col("_f.pos"))
        )
        .select("_id", F.col("pos").alias("start"))
    )
    # merge later-occurrence windows into disjoint removal spans per doc
    # (lag sweep: a start opens a new span iff it clears the previous
    # window's reach — covers overlap AND zero-gap adjacency)
    w = Window.partitionBy("_id").orderBy("start")
    isl = dup_starts.withColumn(
        "_new",
        F.when(
            F.lag("start").over(w).isNull()
            | (F.col("start") > F.lag("start").over(w) + F.lit(L)),
            1,
        ).otherwise(0),
    ).withColumn("_isl", F.sum("_new").over(w))
    doc_spans = (
        isl.groupBy("_id", "_isl")
        .agg(
            F.min("start").cast("long").alias("s"),
            (F.max("start") + F.lit(L - 1)).cast("long").alias("e"),
        )
        .groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("s"), F.col("e")))
            ).alias("_spans")
        )
    )
    joined = base.join(doc_spans, "_id", "left").withColumn(
        "_spans",
        F.coalesce(F.col("_spans"), F.array().cast("array<struct<s:long,e:long>>")),
    )
    # one per-doc fold: concat the inter-span gaps (spans are disjoint and
    # sorted, so each gap substr is non-negative), then the tail
    rebuilt = F.aggregate(
        F.col("_spans"),
        F.struct(
            F.lit(0).cast("long").alias("pe"), F.lit("").alias("acc")
        ),
        lambda a, x: F.struct(
            x["e"].alias("pe"),
            F.concat(
                a["acc"],
                F.col("_t").substr(
                    (a["pe"] + 1).cast("int"), (x["s"] - a["pe"] - 1).cast("int")
                ),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.col("_t").substr(
                (a["pe"] + 1).cast("int"),
                (F.length("_t") - a["pe"]).cast("int"),
            ),
        ),
    )
    n_dropped = F.aggregate(
        F.col("_spans"),
        F.lit(0).cast("long"),
        lambda a, x: a + (x["e"] - x["s"] + F.lit(1)),
    )
    return joined.select(
        F.col("_id").alias(id_col),
        F.length("_t").cast("long").alias("n_chars"),
        n_dropped.alias("n_dropped"),
        rebuilt.alias("deduped_text"),
    )
