"""Greedy pair-merge semantics (operators/tokenize.py).

The catalog corpus has no adjacent same-token repeats, so the overlap
(run-parity) branch is pinned here: greedy left-to-right must merge the
1st, 3rd, ... pair of a repeat run, exactly like a sequential encoder.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from schwab_elt_etl_pipeline_spark.operators.tokenize import (
    apply_pair_merges,
    explode_tokens,
    merge_pass,
    rebuild_docs,
)


def _tokenize(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    return explode_tokens(df)


def _texts(toks):
    out = rebuild_docs(toks).orderBy("doc_id").collect()
    return [r.text_bpe for r in out]


def _reference_merge(tokens: list[str], a: str, b: str) -> list[str]:
    """Sequential greedy left-to-right merge — the semantics contract."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(f"{a}_{b}")
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def test_merge_distinct_pair(spark):
    toks = _tokenize(spark, ["x table hash y table hash", "table y hash"])
    assert _texts(merge_pass(toks, "table", "hash")) == [
        "x table_hash y table_hash",
        "table y hash",
    ]


@pytest.mark.parametrize("run_len", [2, 3, 4, 5, 6])
def test_merge_repeat_run_greedy_parity(spark, run_len):
    doc = " ".join(["a"] * run_len)
    toks = _tokenize(spark, [doc])
    expect = " ".join(_reference_merge(["a"] * run_len, "a", "a"))
    assert _texts(merge_pass(toks, "a", "a")) == [expect]


def test_merge_cascade_order_matters(spark):
    # rule 1 consumes the 'b' that rule 2 would have needed: ordered
    # application must yield a_b c, never a b_c
    toks = _tokenize(spark, ["a b c"])
    assert _texts(apply_pair_merges(toks, [("a", "b"), ("b", "c")])) == ["a_b c"]
    toks2 = _tokenize(spark, ["a b c"])
    assert _texts(apply_pair_merges(toks2, [("b", "c"), ("a", "b")])) == ["a b_c"]


def test_merged_token_does_not_rematch(spark):
    # after (a, a) -> a_a, the new token must not feed the same rule again
    # within the pass: 'a a a a' -> 'a_a a_a', not 'a_a_a_a'
    toks = _tokenize(spark, ["a a a a"])
    merged = _texts(merge_pass(toks, "a", "a"))
    assert merged == ["a_a a_a"]


def test_positions_stay_strictly_increasing(spark):
    # survivors keep their ORIGINAL (gapped) pos — r13 dropped the dense
    # renumbering window because no consumer reads absolute positions;
    # the contract is strict monotonicity in document order
    toks = merge_pass(_tokenize(spark, ["x a b y a b z"]), "a", "b")
    rows = toks.orderBy("pos").collect()
    assert [r.pos for r in rows] == sorted({r.pos for r in rows})
    assert [r.tok for r in rows] == ["x", "a_b", "y", "a_b", "z"]


_ALPHABET = ["a", "b", "c"]  # tiny alphabet → dense repeats and overlaps


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_ALPHABET), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    ),
    merges=st.lists(
        st.tuples(st.sampled_from(_ALPHABET), st.sampled_from(_ALPHABET)),
        min_size=1,
        max_size=3,
    ),
)
def test_merge_cascade_matches_sequential_reference(spark, docs, merges):
    """Property: the relational merge cascade equals the sequential greedy
    encoder on arbitrary repeat-heavy token streams and rule lists
    (including a=b rules and rules whose outputs neighbor later matches)."""
    toks = _tokenize(spark, [" ".join(d) for d in docs])
    got = _texts(apply_pair_merges(toks, merges))
    want = []
    for d in docs:
        cur = d
        for a, b in merges:
            cur = _reference_merge(cur, a, b)
        want.append(" ".join(cur))
    assert got == want


# ---------------------------------------------------------------------------
# train_merges: the full iterative learn loop (count -> argmax -> merge)^k
# ---------------------------------------------------------------------------


def _reference_train(docs: list[list[str]], k: int):
    """Sequential BPE trainer — the semantics contract: overlapping adjacent
    pair counts, argmax with (lhs, rhs) ascending tie-break, greedy merge."""
    from collections import Counter

    cur = [list(d) for d in docs]
    learned = []
    for step in range(1, k + 1):
        counts = Counter()
        for d in cur:
            for i in range(len(d) - 1):
                counts[(d[i], d[i + 1])] += 1
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        learned.append((step, a, b, c))
        cur = [_reference_merge(d, a, b) for d in cur]
    return learned, cur


def test_train_merges_matches_sequential_reference(spark):
    from schwab_elt_etl_pipeline_spark.operators.tokenize import train_merges

    docs = [
        ["a", "b", "a", "b", "c"],
        ["a", "a", "a", "a", "b"],
        ["b", "c", "a", "b", "a", "b"],
    ]
    toks = _tokenize(spark, [" ".join(d) for d in docs])
    learned, final = train_merges(toks, 4)
    want_learned, want_docs = _reference_train(docs, 4)
    assert learned == want_learned
    got = rebuild_docs(final).orderBy("doc_id").collect()
    assert [r.text_bpe.split(" ") for r in got] == want_docs


def test_train_merges_stops_when_no_pairs_remain(spark):
    from schwab_elt_etl_pipeline_spark.operators.tokenize import train_merges

    # single-token docs: zero adjacent pairs from the start
    toks = _tokenize(spark, ["x", "y", "z"])
    learned, final = train_merges(toks, 5)
    assert learned == []
    assert final.count() == 3


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_ALPHABET), min_size=1, max_size=10),
        min_size=1,
        max_size=5,
    ),
    k=st.integers(1, 3),
)
def test_train_merges_property_vs_reference(spark, docs, k):
    """Property: the distributed learn loop equals the sequential trainer on
    arbitrary repeat-heavy corpora — pair selection (incl. ties), learned
    rule order, AND the resulting token streams."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import train_merges

    toks = _tokenize(spark, [" ".join(d) for d in docs])
    learned, final = train_merges(toks, k)
    want_learned, want_docs = _reference_train(docs, k)
    assert learned == want_learned
    got = rebuild_docs(final).orderBy("doc_id").collect()
    assert [r.text_bpe.split(" ") for r in got] == want_docs


# ---------------------------------------------------------------------------
# unigram-LM EM round: lattice Viterbi vs brute-force enumeration
# ---------------------------------------------------------------------------


def _enumerate_best(word: str, vocab: dict[str, int], max_l: int = 4):
    """All segmentations of `word` into vocab pieces; argmin of the operator's
    lexicographic objective (k ASC, summed cnt DESC, reversed lens ASC)."""
    paths: list[tuple[int, int, list[int], list[str]]] = []

    def go(pos, k, s, lens, ps):
        if pos == len(word):
            paths.append((k, s, lens[:], ps[:]))
            return
        for l in range(1, min(max_l, len(word) - pos) + 1):
            piece = word[pos : pos + l]
            if piece in vocab:
                go(pos + l, k + 1, s + vocab[piece], lens + [l], ps + [piece])

    go(0, 0, 0, [], [])
    assert paths, word
    return min(paths, key=lambda p: (p[0], -p[1], list(reversed(p[2]))))


def _seed_vocab(words: dict[str, int], max_l: int = 4, min_count: int = 2):
    cnt: dict[str, int] = {}
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_l, i + 1) + 1):
                piece = w[i - l + 1 : i + 1]
                cnt[piece] = cnt.get(piece, 0) + f
    return {p: c for p, c in cnt.items() if len(p) == 1 or c >= min_count}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=9),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=8,
    )
)
def test_viterbi_segment_matches_enumeration(spark, words):
    """The DP's per-cell tie-break must equal the global lexicographic
    argmin over ALL segmentations — the same claim the DuckDB recursive-CTE
    oracle certifies on the catalog query, here against random inputs."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import (
        seed_subword_vocab,
        viterbi_segment,
    )

    wdf = spark.createDataFrame(list(words.items()), "word string, freq long")
    vocab = seed_subword_vocab(wdf)
    assert {
        (r["piece"], r["cnt"]) for r in vocab.collect()
    } == set(_seed_vocab(words).items())
    got = {
        r["word"]: (r["k"], r["s"], list(r["pieces"]))
        for r in viterbi_segment(wdf, vocab).collect()
    }
    pyvocab = _seed_vocab(words)
    for w in words:
        k, s, _lens, ps = _enumerate_best(w, pyvocab)
        assert got[w] == (k, s, ps), w


def test_unigram_em_round_renormalizes(spark):
    """M-step counts are the freq-weighted piece usages of the chosen
    segmentations, and p_ppm sums to ~1e6."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import unigram_em_round

    words = {"abab": 10, "ab": 5, "ba": 3, "c": 1}
    wdf = spark.createDataFrame(list(words.items()), "word string, freq long")
    out = {r["piece"]: (r["em_cnt"], r["p_ppm"]) for r in unigram_em_round(wdf).collect()}
    pyvocab = _seed_vocab(words)
    want: dict[str, int] = {}
    for w, f in words.items():
        for p in _enumerate_best(w, pyvocab)[3]:
            want[p] = want.get(p, 0) + f
    assert {p: c for p, (c, _) in out.items()} == want
    assert abs(sum(p for _, p in out.values()) - 1_000_000.0) < 1e-6


def _em_rounds(words: dict[str, int], rounds: int, max_l: int = 4):
    """Sequential EM reference: seed vocab, then (segment, recount)^rounds."""
    vocab = _seed_vocab(words, max_l)
    counts: dict[str, int] = {}
    for _ in range(rounds):
        counts = {}
        for w, f in words.items():
            for p in _enumerate_best(w, vocab, max_l)[3]:
                counts[p] = counts.get(p, 0) + f
        vocab = dict(counts)
        for w in words:  # unused single chars persist at count 0
            for ch in w:
                vocab.setdefault(ch, 0)
    return counts


def test_unigram_em_iteration_actually_flips(spark):
    """A case where round 2 CHANGES the solution: 'abc' segments [ab, c] on
    seed counts (reversed-lens tie-break) but [a, bc] on round-1 EM counts
    (c's mass collapses, bc's grows) — pinning that rounds=2 re-segments
    against the RETRAINED vocabulary rather than re-running round 1."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import unigram_em_round

    words = {"abc": 1, "bc": 8, "ab": 2}
    wdf = spark.createDataFrame(list(words.items()), "word string, freq long")
    r1 = {
        r["piece"]: r["em_cnt"]
        for r in unigram_em_round(wdf, max_piece_len=2, rounds=1).collect()
    }
    r2 = {
        r["piece"]: r["em_cnt"]
        for r in unigram_em_round(wdf, max_piece_len=2, rounds=2).collect()
    }
    assert r1 == _em_rounds(words, 1, max_l=2) == {"ab": 3, "c": 1, "bc": 8}
    assert r2 == _em_rounds(words, 2, max_l=2) == {"a": 1, "ab": 2, "bc": 9}
    assert r1 != r2


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.dictionaries(
        st.text(alphabet="ab", min_size=1, max_size=7),
        st.integers(min_value=1, max_value=20),
        min_size=1,
        max_size=6,
    )
)
@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_unigram_em_two_rounds_match_sequential_reference(spark, words):
    from schwab_elt_etl_pipeline_spark.operators.tokenize import unigram_em_round

    wdf = spark.createDataFrame(list(words.items()), "word string, freq long")
    got = {
        r["piece"]: r["em_cnt"]
        for r in unigram_em_round(wdf, max_piece_len=3, rounds=2).collect()
    }
    assert got == _em_rounds(words, 2, max_l=3)


def test_unigram_tokenize_unseen_char_falls_back_to_whole_word(spark):
    """A word containing a character absent from the trained vocab has an
    unreachable final DP cell; viterbi_segment must DROP the row (not emit
    empty pieces) so unigram_tokenize_docs' left-join coalesce passes the
    word through whole — the trained-vocab-on-new-corpus contract."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import (
        unigram_tokenize_docs,
        viterbi_segment,
    )

    vocab = spark.createDataFrame(
        [("a", 5), ("b", 3), ("ab", 4)], "piece string, cnt long"
    )
    words = spark.createDataFrame([("abz",), ("ab",)], "word string")
    segs = viterbi_segment(words, vocab)
    got = {r["word"]: list(r["pieces"]) for r in segs.collect()}
    assert got == {"ab": ["ab"]}  # 'abz' dropped: z is not segmentable

    docs = spark.createDataFrame(
        [(1, "ab abz b")], "doc_id long, text string"
    )
    out = unigram_tokenize_docs(docs, vocab).collect()[0]
    assert out["text_seg"] == "ab abz b"  # abz passes through whole
    assert out["n_words"] == 3 and out["n_pieces"] == 3


# ---------------------------------------------------------------------------
# WordPiece greedy longest-match apply
# ---------------------------------------------------------------------------


def _py_wordpiece(word: str, vocab: set, m: int = 4):
    """Reference greedy longest-match-first walk (the BERT apply rule)."""
    pos, ps = 0, []
    while pos < len(word):
        best = 0
        for l in range(1, min(m, len(word) - pos) + 1):
            form = word[pos : pos + l] if pos == 0 else "##" + word[pos : pos + l]
            if form in vocab:
                best = l
        if best == 0:
            return ["[UNK]"], True
        ps.append(
            word[pos : pos + best] if pos == 0 else "##" + word[pos : pos + best]
        )
        pos += best
    return ps, False


def test_wordpiece_unseen_char_is_whole_word_unk(spark):
    """A word with any unmatchable position collapses to ONE [UNK] token —
    the whole-word rule, not per-char fallback."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import (
        wordpiece_segment,
    )

    vocab = spark.createDataFrame(
        [("ab", 5), ("a", 5), ("b", 5), ("##b", 5), ("##a", 5)],
        "piece string, cnt long",
    )
    words = spark.createDataFrame(
        [("abab", 1), ("abxb", 1), ("zz", 1)], "word string, freq long"
    )
    out = {
        r.word: (r.pieces, r.n_pieces, r.is_unk)
        for r in wordpiece_segment(words, vocab).collect()
    }
    assert out["abab"] == (["ab", "##a", "##b"], 3, False)  # longest first
    assert out["abxb"] == (["[UNK]"], 1, True)  # 'x' unmatchable anywhere
    assert out["zz"] == (["[UNK]"], 1, True)  # no lattice row at all


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=9), min_size=1, max_size=12
    )
)
@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_wordpiece_matches_python_reference(spark, words):
    """Spark greedy walk == the sequential Python reference over the
    corpus-seeded ##-vocabulary, for every word."""
    from schwab_elt_etl_pipeline_spark.operators.tokenize import (
        wordpiece_segment,
        wordpiece_vocab,
    )

    from pyspark.sql import functions as F

    wdf = (
        spark.createDataFrame([(w,) for w in words], "word string")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    vdf = wordpiece_vocab(wdf, max_piece_len=4, min_count=2)
    vocab = {r.piece for r in vdf.collect()}
    got = {
        r.word: (r.pieces, r.is_unk)
        for r in wordpiece_segment(wdf, vdf).collect()
    }
    for w in set(words):
        ps, unk = _py_wordpiece(w, vocab)
        assert got[w] == (ps, unk), w
