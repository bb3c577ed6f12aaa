"""Tokenizer training + merge application: BPE-style greedy pair merging
at scale — :func:`train_merges` learns the ordered rule list (count ->
argmax -> rewrite, one corpus pass per rule), :func:`apply_pair_merges`
applies a fixed one.

A trained BPE/WordPiece tokenizer is an ordered list of merge rules
``(a, b) -> ab``; applying it to a corpus is the single hottest op in a
training-data pipeline (every document, every epoch of data prep). The
kernel here applies a FIXED merge list over word tokens — the same greedy
left-to-right semantics per rule as `github.com/openai/tiktoken`-style
encoders apply per character pair, expressed relationally so the whole
corpus tokenizes as one declarative plan:

- tokens explode once to (doc_id, pos, tok) rows;
- each merge rule is two window passes partitioned by doc_id (attach the
  next-token adjacency ``nxt`` via lead — eligibility ``tok=a AND nxt=b``
  is then a projection — and mark absorbed right-hand rows via lag),
  resolving overlaps greedily left-to-right (within a maximal run of
  eligible positions, merge the 1st, 3rd, ... — for a ≠ b runs are
  length-1 and the run machinery drops out of the plan; for a = b it
  reproduces exact greedy semantics on token repeats). Survivors KEEP
  their original pos (r13 optimization, guide §2.4): every consumer
  orders by pos, none reads absolute values, so the former dense
  renumbering (a third window pass per rule) was pure cost;
- every window in every pass partitions by doc_id, so Catalyst plans ONE
  shuffle for the whole cascade and re-sorts within partitions per pass.

Per-document work is O(tokens × merges); the merge list is plan-time
literals (the trained vocab is small and static — at 100 TB it ships in
the plan, never joins). No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def explode_tokens(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, tok) rows; 1-based pos; whitespace tokenization
    identical to ``operators/dedup.py`` (casefold, trim, split on runs)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos0", "tok"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


def with_next(toks: DataFrame) -> DataFrame:
    """Attach ``nxt`` = the next surviving token in pos order (NULL on the
    last row of each doc). Computed lazily where adjacency is needed (pair
    counting, merge eligibility); deliberately NOT carried through pass
    outputs — an A/B showed the extra string column flowing through every
    window buffer and checkpoint cost more than recomputing the lead."""
    wd = Window.partitionBy("doc_id").orderBy("pos")
    return toks.withColumn("nxt", F.lead("tok").over(wd))


def merge_pass(
    toks: DataFrame, a: str, b: str, joined: str | None = None
) -> DataFrame:
    """One merge rule ``(a, b) -> joined`` over (doc_id, pos, tok[, nxt])
    rows, greedy left-to-right within overlap runs. Output rows keep their
    original (now possibly gapped) pos — consumers order by pos, none
    reads absolute values, and dropping the dense renumbering saves a
    whole window pass per rule (r13, guide §2.4)."""
    joined = joined if joined is not None else f"{a}_{b}"
    if "nxt" not in toks.columns:
        toks = with_next(toks)
    wd = Window.partitionBy("doc_id").orderBy("pos")
    # eligibility is a projection over the adjacency column — no extra window
    step = toks.withColumn("elig", (F.col("tok") == a) & (F.col("nxt") == b))
    if a == b:
        # overlap runs (eligible at consecutive positions) only exist when
        # the rule is a repeat (a = b): resolve greedily left-to-right by
        # merging the 1st, 3rd, ... position of each run (parity within run)
        step = step.withColumn(
            "run_start",
            F.col("elig") & ~F.coalesce(F.lag("elig").over(wd), F.lit(False)),
        )
        step = step.withColumn(
            "grp",
            F.sum(F.col("run_start").cast("int")).over(
                wd.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        wg = Window.partitionBy("doc_id", "grp").orderBy("pos")
        step = step.withColumn(
            "merged", F.col("elig") & (F.row_number().over(wg) % 2 == 1)
        )
    else:
        # a ≠ b: two eligible positions can never be adjacent (that would
        # need tok[i]=a, tok[i+1]=b=a) — every eligible position merges,
        # and the run machinery disappears from the plan
        step = step.withColumn("merged", F.col("elig"))
    step = step.withColumn(
        "absorbed", F.coalesce(F.lag("merged").over(wd), F.lit(False))
    )
    return step.filter(~F.col("absorbed")).select(
        "doc_id",
        "pos",
        F.when(F.col("merged"), F.lit(joined)).otherwise(F.col("tok")).alias(
            "tok"
        ),
    )


def apply_pair_merges(
    toks: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply an ordered merge list; each rule is one window pass."""
    for a, b in merges:
        toks = merge_pass(toks, a, b)
    return toks


def pair_counts(toks: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies over (doc_id, pos, tok[, nxt])
    rows: (lhs, rhs, freq), overlapping occurrences counted (``a a a``
    yields (a, a) twice — the classic BPE counting convention). Map-side
    combinable: one (lhs, rhs) shuffle of partial counts."""
    if "nxt" not in toks.columns:
        toks = with_next(toks)
    return (
        toks.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("lhs"), F.col("nxt").alias("rhs"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_merges(
    toks: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The full iterative BPE learn loop, distributed: repeat ``n_merges``
    times { count adjacent pairs corpus-wide -> take the argmax pair
    (ties broken by (lhs, rhs) ascending — deterministic) -> greedily merge
    it everywhere via :func:`merge_pass` }. Returns the learned merge table
    ``[(step, lhs, rhs, freq_at_selection)]`` and the final token frame.

    Scale shape: per iteration the ONLY driver-side state is the single
    winning (pair, count) row — the counting aggregation is map-side
    combinable and the rewrite is a window pass on the existing doc_id
    partitioning, so each iteration is one pass over the token set
    regardless of corpus size (the reason BPE training parallelizes; cf.
    Sennrich et al. 2016 and the counting step ``bpe_pair_stats``). Each
    iteration local-checkpoints the rewritten tokens so iteration *k* never
    re-executes passes 1..k-1. Stops early when no adjacent pair remains.
    """
    learned: list[tuple[int, str, str, int]] = []
    toks = toks.localCheckpoint(eager=False)
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(toks)
            .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()  # 1-row scalar: the winning pair of this iteration
        )
        if not top:
            break
        lhs, rhs, freq = top[0]["lhs"], top[0]["rhs"], int(top[0]["freq"])
        learned.append((step, lhs, rhs, freq))
        toks = merge_pass(toks, lhs, rhs).localCheckpoint(eager=False)
    return learned, toks


def rebuild_docs(toks: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, text_bpe): the tokenized documents reassembled in
    position order (order pinned via sorted (pos, tok) structs — groupBy
    collect order is not deterministic on its own)."""
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_bpe"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer: seed vocab -> EM round
# ---------------------------------------------------------------------------


def seed_subword_vocab(
    words: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Seed subword vocabulary for unigram-LM training: every substring of
    length 1..max_piece_len of the corpus words, counted with the word's
    corpus frequency (the SentencePiece seeding recipe). Single-character
    pieces are always kept — they guarantee every word stays segmentable —
    and longer pieces must clear ``min_count``. Output: (piece, cnt)."""
    occ = (
        words.withColumn("i", F.explode(F.sequence(F.lit(1), F.length(word_col))))
        .withColumn(
            "l",
            F.explode(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), F.col("i")))
            ),
        )
        .select(
            F.expr(f"substring({word_col}, i - l + 1, l)").alias("piece"),
            F.col(freq_col).alias("freq"),
        )
    )
    return (
        occ.groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .filter((F.length("piece") == 1) | (F.col("cnt") >= min_count))
    )


def viterbi_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    word_col: str = "word",
) -> DataFrame:
    """Exact-arithmetic Viterbi segmentation over the bounded subword
    lattice: per word, the segmentation minimizing the lexicographic
    objective (piece count ASC, summed piece count DESC, reversed length
    sequence ASC) — the integer-exact unigram-LM E-step this suite can
    certify bit-for-bit (the max-likelihood form maximizes Σ log p; fewest
    pieces + most-frequent pieces is its deterministic no-transcendentals
    surrogate, the same discipline as the rational BM25/TF-IDF scores).

    Shape: the candidate edges are one explode + one broadcast vocab join
    (O(|word| × max_piece_len) per word); the DP and the backtrace are
    per-row higher-order ``aggregate`` expressions over the bounded word
    length — no shuffle, no UDF, whole-stage codegen'd. The per-cell
    tie-break (smallest edge length) composes to the global
    reversed-length-sequence order, which is what the brute-force
    enumeration oracle sorts by (see UNIGRAM_EM_SQL).

    Output: (word, pieces array<string>, k, s).
    """
    m = max_piece_len
    edges = (
        words.select(word_col)
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.length(word_col))))
        .withColumn(
            "l", F.explode(F.sequence(F.lit(1), F.least(F.lit(m), F.col("i"))))
        )
        .withColumn("piece", F.expr(f"substring({word_col}, i - l + 1, l)"))
        .join(F.broadcast(vocab.select("piece", "cnt")), "piece")
    )
    lattice = edges.groupBy(word_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("i") * (m + 1) + F.col("l")).alias("key"),
                    F.col("cnt").alias("value"),
                )
            )
        ).alias("em")
    )
    # dp[i+1] = best (k, s, backlen) for the length-i prefix; cell i folds
    # the <= max_piece_len incoming edges with an inner aggregate. l runs
    # ascending and only a STRICT improvement replaces, so (k, s) ties keep
    # the smallest edge length.
    dp_expr = f"""
    aggregate(
      sequence(1, length({word_col})),
      array(named_struct('k', 0, 's', 0L, 'bl', 0)),
      (acc, i) -> acc || array(
        aggregate(
          sequence(1, least({m}, i)),
          named_struct('k', 2147483647, 's', 0L, 'bl', 0),
          (best, l) -> CASE
            WHEN NOT map_contains_key(em, i * {m + 1} + l)
                 OR element_at(acc, i - l + 1).k = 2147483647 THEN best
            WHEN element_at(acc, i - l + 1).k + 1 < best.k
                 OR (element_at(acc, i - l + 1).k + 1 = best.k
                     AND element_at(acc, i - l + 1).s
                         + element_at(em, i * {m + 1} + l) > best.s)
            THEN named_struct(
                   'k', element_at(acc, i - l + 1).k + 1,
                   's', element_at(acc, i - l + 1).s
                        + element_at(em, i * {m + 1} + l),
                   'bl', l)
            ELSE best END
        )
      )
    )"""
    back_expr = f"""
    aggregate(
      sequence(1, length({word_col})),
      named_struct('pos', length({word_col}),
                   'ps', cast(array() as array<string>)),
      (st, _x) -> CASE WHEN st.pos <= 0 THEN st ELSE named_struct(
          'pos', st.pos - element_at(dp, st.pos + 1).bl,
          'ps', array(substring({word_col},
                                st.pos - element_at(dp, st.pos + 1).bl + 1,
                                element_at(dp, st.pos + 1).bl)) || st.ps)
      END
    ).ps"""
    return (
        lattice.withColumn("dp", F.expr(dp_expr))
        .select(
            word_col,
            F.expr(back_expr).alias("pieces"),
            F.expr(f"element_at(dp, length({word_col}) + 1).k").alias("k"),
            F.expr(f"element_at(dp, length({word_col}) + 1).s").alias("s"),
        )
        # A word containing a character absent from the vocab leaves the
        # final DP cell unreachable (k = sentinel); dropping the row lets
        # apply paths fall back to the whole word via their left-join
        # coalesce instead of emitting length(word) empty pieces. Training
        # vocabularies always carry every corpus single char, so this never
        # fires there.
        .filter(F.col("k") != 2147483647)
    )


def pruned_vocab(counts: DataFrame, ones: DataFrame) -> DataFrame:
    """The post-EM vocabulary: the M-step counts (corpus-unused pieces
    drop out) plus unused single characters at count 0, so every word
    stays segmentable — the SentencePiece pruning rule."""
    return counts.select("piece", F.col("em_cnt").alias("cnt")).unionByName(
        ones.join(counts, "piece", "left_anti").withColumn(
            "cnt", F.lit(0).cast("long")
        )
    )


def unigram_em_round(
    words: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
    rounds: int = 1,
) -> DataFrame:
    """``rounds`` unigram-LM EM iterations: seed vocabulary -> (Viterbi
    E-step over every distinct word -> count-renormalization M-step)^k.
    Returns the retrained piece table (piece, em_cnt, p_ppm), completing
    the tokenizer-trainer story next to the iterative BPE trainer
    (``train_merges``).

    From round 2 the vocabulary is the PREVIOUS round's M-step counts —
    pieces the corpus never used drop out (SentencePiece's in-loop
    vocabulary pruning) except single characters, which are always kept
    (at count 0 if unused) so every word stays segmentable. Each round's
    small vocabulary is eagerly checkpointed: without it round k's lineage
    would re-run rounds 1..k-1 per consumer (the ``train_merges`` lesson).

    Scale shape: training runs over DISTINCT words weighted by corpus
    frequency (the standard trick — segmentation is per-type, corpus size
    only enters through the integer weights), the vocabulary broadcasts,
    and the only aggregations are vocabulary-sized groupBys. p_ppm is one
    fixed-order double expression over exact integer counts.
    """
    vocab = seed_subword_vocab(words, max_piece_len, min_count, word_col, freq_col)
    ones = vocab.filter(F.length("piece") == 1).select("piece").localCheckpoint(
        eager=True
    )
    m = None
    for _ in range(rounds):
        if m is not None:
            vocab = pruned_vocab(m, ones)
        vocab = vocab.localCheckpoint(eager=True)  # vocabulary-sized
        segs = viterbi_segment(words, vocab, max_piece_len, word_col)
        m = (
            segs.join(words, word_col)
            .select(
                F.explode("pieces").alias("piece"), F.col(freq_col).alias("freq")
            )
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("em_cnt"))
            .localCheckpoint(eager=True)
        )
    tot = m.agg(F.sum("em_cnt").cast("long").alias("total"))
    return m.crossJoin(F.broadcast(tot)).select(  # 1-row total scalar
        "piece",
        "em_cnt",
        (
            F.col("em_cnt").cast("double")
            / F.col("total").cast("double")
            * F.lit(1000000.0)
        ).alias("p_ppm"),
    )


def unigram_tokenize_docs(
    docs: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 16,
) -> DataFrame:
    """APPLY a trained unigram-LM vocabulary to a corpus — the unigram twin
    of ``apply_pair_merges``: every word (whitespace token, lowered) is
    Viterbi-segmented once per TYPE (the per-type trick again: segmentation
    depends only on the word, so distinct words segment once and documents
    join the result), and documents rebuild in position order. Words longer
    than ``max_word_len`` pass through unsegmented (none exist in the
    benchmark corpus; the cap bounds the enumeration oracle).

    Output: (id, n_words, n_pieces, text_seg) with pieces space-joined.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(toks).alias("pos", "word"),
    )
    words = (
        exploded.filter(
            (F.length("word") >= 1) & (F.length("word") <= max_word_len)
        )
        .select("word")
        .distinct()
    )
    segs = viterbi_segment(words, vocab, max_piece_len).select("word", "pieces")
    joined = exploded.join(F.broadcast(segs), "word", "left").select(
        "_id",
        "pos",
        "word",
        F.coalesce("pieces", F.array(F.col("word"))).alias("pieces"),
    )
    return joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("pieces")).cast("long").alias("n_pieces"),
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ),
            " ",
        ).alias("text_seg"),
    ).select(
        F.col("_id").alias(id_col), "n_words", "n_pieces", "text_seg"
    )


def wordpiece_vocab(
    words: DataFrame,
    max_piece_len: int = 4,
    min_count: int = 2,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """WordPiece vocabulary seeded from corpus substrings: word-INITIAL
    substrings keep their surface form, word-internal substrings carry the
    ``##`` continuation prefix (the BERT convention — public literature:
    Wu et al. 2016, Devlin et al. 2018). Single-character base pieces of
    BOTH forms are always kept (every letter stays representable); longer
    pieces must clear ``min_count`` summed corpus frequency. Output:
    (piece, cnt). Assumes ``#`` is not a corpus character (the standard
    WordPiece sentinel assumption)."""
    occ = (
        words.withColumn("i", F.explode(F.sequence(F.lit(1), F.length(word_col))))
        .withColumn(
            "l",
            F.explode(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), F.col("i")))
            ),
        )
        .select(
            F.when(
                F.col("i") - F.col("l") + 1 == 1,
                F.expr(f"substring({word_col}, i - l + 1, l)"),
            )
            .otherwise(
                F.concat(F.lit("##"), F.expr(f"substring({word_col}, i - l + 1, l)"))
            )
            .alias("piece"),
            F.col("l").alias("base_len"),
            F.col(freq_col).alias("freq"),
        )
    )
    return (
        occ.groupBy("piece")
        .agg(
            F.sum("freq").cast("long").alias("cnt"),
            F.max("base_len").alias("_bl"),
        )
        .filter((F.col("_bl") == 1) | (F.col("cnt") >= min_count))
        .select("piece", "cnt")
    )


def wordpiece_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    word_col: str = "word",
) -> DataFrame:
    """Greedy longest-match-first WordPiece segmentation (the BERT apply
    rule): at each position consume the LONGEST vocabulary piece matching
    the remaining suffix — initial positions match surface pieces,
    continuation positions match ``##``-prefixed pieces; a word with any
    unmatchable position collapses to the single ``[UNK]`` token (the
    whole-word UNK rule). Completes the apply family next to the BPE merge
    cascade (:func:`apply_pair_merges`) and the unigram Viterbi
    (:func:`viterbi_segment`): three tokenizer families, one engine
    discipline.

    Shape: candidate matches are one explode + one broadcast vocab join;
    the per-(word, position) longest match folds into a map, and the
    greedy walk is ONE higher-order ``aggregate`` over the bounded word
    length — no shuffle, no UDF, no driver loop (the ``viterbi_segment``
    discipline; greedy needs no DP, just the walk). Per-TYPE cost: words
    segment once regardless of corpus frequency.

    Output: (word, pieces array<string>, n_pieces, is_unk).
    """
    m = max_piece_len
    matches = (
        words.select(word_col)
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.length(word_col))))
        .withColumn(
            "l", F.explode(F.sequence(F.lit(1), F.least(F.lit(m), F.col("i"))))
        )
        .withColumn("i0", F.col("i") - F.col("l") + 1)
        .withColumn(
            "form",
            F.when(F.col("i0") == 1, F.expr(f"substring({word_col}, i0, l)"))
            .otherwise(
                F.concat(F.lit("##"), F.expr(f"substring({word_col}, i0, l)"))
            ),
        )
        .join(F.broadcast(vocab.select(F.col("piece").alias("form"))), "form")
        .groupBy(word_col, "i0")
        .agg(F.max("l").alias("lm"))
    )
    lattice = matches.groupBy(word_col).agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(F.col("i0").alias("key"), F.col("lm").alias("value"))
            )
        ).alias("lm")
    )
    walk_expr = f"""
    aggregate(
      sequence(1, length({word_col})),
      named_struct('pos', 1,
                   'ps', cast(array() as array<string>),
                   'ok', true),
      (st, _x) -> CASE
        WHEN NOT st.ok OR st.pos > length({word_col}) THEN st
        WHEN NOT map_contains_key(lm, st.pos)
          THEN named_struct('pos', st.pos, 'ps', st.ps, 'ok', false)
        ELSE named_struct(
          'pos', st.pos + element_at(lm, st.pos),
          'ps', st.ps || array(CASE WHEN st.pos = 1
            THEN substring({word_col}, st.pos, element_at(lm, st.pos))
            ELSE concat('##', substring({word_col}, st.pos,
                                        element_at(lm, st.pos))) END),
          'ok', true)
      END
    )"""
    segmented = (
        lattice.withColumn("walk", F.expr(walk_expr))
        .select(
            word_col,
            F.when(F.col("walk.ok"), F.col("walk.ps"))
            .otherwise(F.array(F.lit("[UNK]")))
            .alias("pieces"),
            (~F.col("walk.ok")).alias("is_unk"),
        )
    )
    # words with NO vocab match anywhere never reach the lattice: [UNK] too
    return (
        words.select(word_col)
        .distinct()
        .join(segmented, word_col, "left")
        .select(
            word_col,
            F.coalesce("pieces", F.array(F.lit("[UNK]"))).alias("pieces"),
            F.size(F.coalesce("pieces", F.array(F.lit("[UNK]")))).alias(
                "n_pieces"
            ),
            F.coalesce("is_unk", F.lit(True)).alias("is_unk"),
        )
    )
