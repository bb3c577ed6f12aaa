"""Property tests for the round-7 behavioral wave: label propagation and
first-occurrence novelty vs sequential references (the linear_recurrence
discipline — random inputs, exact semantic mirror)."""

from __future__ import annotations

import pytest

from schwab_elt_etl_pipeline_spark.operators.graph import label_propagation
from schwab_elt_etl_pipeline_spark.operators.text import first_seen_novelty

from hypothesis import given, settings, strategies as st


def _seq_lpa(edges: list[tuple[int, int]], rounds: int) -> dict[int, int]:
    """Sequential synchronous LPA, mirroring the operator exactly: seeds are
    the DISTINCT sources; only currently-labeled nodes vote; duplicate edges
    vote twice (the operator counts rows); ties take the smallest label;
    nodes receiving no votes drop out of the next round."""
    cur = {s: s for s, _ in edges}
    for _ in range(rounds):
        votes: dict[int, dict[int, int]] = {}
        for s, d in edges:
            if s in cur:
                lab = cur[s]
                votes.setdefault(d, {})
                votes[d][lab] = votes[d].get(lab, 0) + 1
        cur = {
            d: max(vs.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            for d, vs in votes.items()
        }
    return cur


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=18,
    ),
    rounds=st.integers(min_value=1, max_value=3),
)
@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_lpa_matches_sequential_reference(spark, edges, rounds):
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == _seq_lpa(edges, rounds)


def test_lpa_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge keep distinct communities — the
    behavior that separates LPA from connected components. (4-cliques: each
    member's 3 internal votes outvote the 1 bridge vote; in a 3-clique the
    round-1 all-ties-of-one let the smaller bridge label flood across.)"""
    cliques = [(a, b) for grp in ([0, 1, 2, 3], [10, 11, 12, 13]) for a in grp
               for b in grp if a != b]
    bridge = [(3, 10), (10, 3)]
    df = spark.createDataFrame(cliques + bridge, "src int, dst int")
    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=3).collect()}
    assert got[0] == got[1] == got[2] == got[3] == 0
    assert got[10] == got[11] == got[12] == got[13] == 10


def test_lpa_string_vertex_ids(spark):
    """The generic src/dst parameters invite string vertex ids; the
    smallest-label tie-break must work for any orderable type (pinned after
    the numeric-only ``-label`` negation was replaced by a min_by over
    (-cnt, label)). Mirror of the two-clique test on string nodes."""
    cliques = [
        (a, b)
        for grp in (["a0", "a1", "a2", "a3"], ["b0", "b1", "b2", "b3"])
        for a in grp
        for b in grp
        if a != b
    ]
    bridge = [("a3", "b0"), ("b0", "a3")]
    df = spark.createDataFrame(cliques + bridge, "src string, dst string")
    got = {r["node"]: r["label"] for r in label_propagation(df, rounds=3).collect()}
    assert got["a0"] == got["a1"] == got["a2"] == got["a3"] == "a0"
    assert got["b0"] == got["b1"] == got["b2"] == got["b3"] == "b0"


def _seq_assoc(baskets: dict[int, list[str]], min_support: int) -> dict:
    from itertools import combinations

    item: dict[str, int] = {}
    pair: dict[tuple[str, str], int] = {}
    for items in baskets.values():
        s = sorted(set(items))
        for it in s:
            item[it] = item.get(it, 0) + 1
        for a, b in combinations(s, 2):
            pair[(a, b)] = pair.get((a, b), 0) + 1
    nb = len(baskets)
    out = {}
    for (a, b), c in pair.items():
        if c < min_support:
            continue
        for ante, cons in ((a, b), (b, a)):
            out[(ante, cons)] = (
                c,
                item[ante],
                item[cons],
                c / nb,
                c / item[ante],
                c * nb / (item[ante] * item[cons]),
            )
    return out


@settings(max_examples=6, deadline=None)
@given(
    raw=st.lists(
        st.lists(st.sampled_from(["p", "q", "r", "s"]), min_size=0, max_size=4),
        min_size=1,
        max_size=10,
    ),
    min_support=st.integers(min_value=1, max_value=3),
)
def test_assoc_rules_match_sequential(spark, raw, min_support):
    from schwab_elt_etl_pipeline_spark.catalog.analytics12 import (
        rules_from_baskets,
    )

    baskets = {i: items for i, items in enumerate(raw)}
    rows = [(i, sorted(set(items))) for i, items in baskets.items()]
    df = spark.createDataFrame(rows, "user_id long, items array<string>")
    got = {
        (r.antecedent, r.consequent): (
            r.pair_cnt, r.ante_cnt, r.cons_cnt, r.support, r.confidence, r.lift
        )
        for r in rules_from_baskets(df, min_support).collect()
    }
    want = _seq_assoc(baskets, min_support)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[:3] == w[:3]
        for gi, wi in zip(g[3:], w[3:]):
            assert gi == pytest.approx(wi, abs=1e-6)


_WORDS = ["aa", "bb", "cc", "dd"]


def _seq_novelty(docs: list[tuple[int, str]], n: int) -> dict[int, tuple]:
    first: dict[str, int] = {}
    out: dict[int, tuple] = {}
    for doc_id, text in sorted(docs):
        toks = text.strip().lower().split()
        grams = (
            {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            if len(toks) >= n
            else set()
        )
        if not grams:
            continue
        new = sum(1 for g in grams if first.setdefault(g, doc_id) == doc_id)
        out[doc_id] = (len(grams), new, new / len(grams))
    return out


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=3),
)
def test_first_seen_novelty_matches_sequential(spark, texts, n):
    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_new"], r["novelty"])
        for r in first_seen_novelty(df, n=n).collect()
    }
    want = _seq_novelty(docs, n)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0] and got[d][1] == want[d][1]
        assert got[d][2] == pytest.approx(want[d][2], abs=1e-6)
