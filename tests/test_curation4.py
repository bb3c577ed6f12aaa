"""Curation wave 4 units: URL canonicalization rules, deterministic shard
hash, intra-doc self-repetition excision (the catalog oracles cover the
end-to-end queries; these pin the operator rules on hand-built cases)."""

from __future__ import annotations

from schwab_elt_etl_pipeline_spark.operators.dedup import (
    intradoc_dedup_rebuild,
)
from schwab_elt_etl_pipeline_spark.operators.sharding import (
    _KNUTH,
    _MASK32,
    shard_manifest,
    shard_of,
)
from schwab_elt_etl_pipeline_spark.operators.urls import (
    canonical_url,
    url_dup_groups,
)


def test_canonical_url_rules(spark):
    cases = [
        # (raw, canonical)
        ("https://WWW.Ex.COM:443/a/b?utm_source=x&page=2&utm_c=y",
         "https://ex.com/a/b?page=2"),
        ("http://ex.com/a/b/?fbclid=99",              # scheme, slash, clickid
         "https://ex.com/a/b"),
        ("https://WWW.www.Ex.com/a//",                # multi-www, multi-slash
         "https://ex.com/a"),
        ("https://ex.com/watch?id=123",               # ?id= KEYS a page: kept
         "https://ex.com/watch?id=123"),
        ("https://ex.com/a/b?page=2#frag",            # fragment dropped
         "https://ex.com/a/b?page=2"),
        ("https://ex.com/a/b?z=1&a=2",                # params sorted
         "https://ex.com/a/b?a=2&z=1"),
        ("https://ex.com/a/b?ref=tw&fbclid=abc&gclid=1",  # all tracking
         "https://ex.com/a/b"),
        ("https://ex.com:8080/a",                     # non-default port KEPT
         "https://ex.com:8080/a"),
        ("http://ex.com:80/a",                        # default ports dropped
         "https://ex.com/a"),
        ("https://ex.com:0443/a",                     # zero-padded default
         "https://ex.com/a"),
        ("https://u:pw@ex.com/a",                     # userinfo ':' != port
         "https://ex.com/a"),
        ("https://www.com/x",                         # www IS the domain:
         "https://www.com/x"),                        # strip guard holds
        ("https://www.www.site.org/x",                # multi-www + guard
         "https://site.org/x"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [c for _, c in cases]


def test_url_dup_groups_collapse_spellings(spark):
    rows = [
        (1, "https://WWW.Ex.COM/p?utm_source=a&page=1"),
        (2, "https://ex.com/p?page=1&ref=x"),
        (3, "https://ex.com/p?page=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.canonical_url: (r.n_docs, r.first_doc)
        for r in url_dup_groups(df).collect()
    }
    assert got == {
        "https://ex.com/p?page=1": (2, 1),
        "https://ex.com/p?page=2": (1, 3),
    }


def test_shard_of_matches_python_reference(spark):
    ids = [0, 1, 7, 12345, 10**12]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = [r[0] for r in df.select(shard_of("doc_id", 8)).collect()]
    assert got == [((i * _KNUTH) & _MASK32) % 8 for i in ids]


def test_shard_manifest_shares_and_empty_text(spark):
    rows = [(i, "w " * (i + 1)) for i in range(20)] + [(20, "  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = shard_manifest(df, shards=4).collect()
    assert sum(r.n_docs for r in out) == 21
    assert sum(r.sum_tokens for r in out) == sum(range(1, 21))  # blank = 0
    # ppm shares from integer div: each within [0, 1e6], total <= 1e6
    assert all(0 <= r.docs_share_ppm <= 1_000_000 for r in out)
    assert sum(r.docs_share_ppm for r in out) <= 1_000_000


def test_intradoc_dedup_keeps_first_in_doc_only(spark):
    p1 = "a " * 20  # one 20-token passage, repeated inside doc 1
    doc1 = (p1 + p1 + "b " * 20).strip()
    doc2 = p1.strip()  # same passage in ANOTHER doc: untouched
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_passages, r.n_kept, r.deduped_text)
        for r in intradoc_dedup_rebuild(df, passage_tokens=20).collect()
    }
    assert got[1] == (3, 2, ("a " * 20 + "b " * 20).strip())
    assert got[2] == (1, 1, p1.strip())  # cross-doc repeat survives


def test_canonical_url_idempotent_and_collapses_equivalents(spark):
    """Property sweep over randomized messy URLs: (a) canonicalization is
    IDEMPOTENT (canonical of a canonical is itself — no rule keeps
    rewriting), and (b) every messy spelling of a base page (www/case/
    port/slash/fragment/tracking-param/param-order perturbations) lands
    on its base's canonical form."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(40):
        host = rng.choice(["ex.com", "Sub.Ex.COM", "news.site.org"])
        path = "/" + "/".join(
            rng.choice(["a", "b", "docs", "x1"]) for _ in range(rng.randint(1, 3))
        )
        real = [f"p{j}={rng.randint(0, 9)}" for j in range(rng.randint(0, 2))]
        base = f"https://{host.lower()}{path}" + (
            "?" + "&".join(sorted(real)) if real else ""
        )
        # messy spelling: perturb everything canonicalization must undo
        trackers = rng.sample(
            ["utm_source=x", "utm_campaign=c", "ref=tw", "gclid=9", "msclkid=7"],
            rng.randint(0, 3),
        )
        params = real + trackers
        rng.shuffle(params)
        messy = (
            f"{rng.choice(['http', 'https'])}://"
            f"{rng.choice(['www.', 'WWW.', 'www.www.', ''])}{host}"
            f"{rng.choice([':443', ''])}{path}{rng.choice(['/', '//', ''])}"
            + ("?" + "&".join(params) if params else "")
            + rng.choice(["", "#frag"])
        )
        rows.append((i, base, messy))
    df = spark.createDataFrame(rows, "i long, base string, messy string")
    out = df.select(
        "i",
        canonical_url("base").alias("c_base"),
        canonical_url("messy").alias("c_messy"),
        canonical_url(canonical_url("messy")).alias("c_c_messy"),
    ).collect()
    for r in out:
        assert r.c_messy == r.c_base, (r.i, r.c_messy, r.c_base)
        assert r.c_c_messy == r.c_messy, (r.i, "not idempotent")


def test_canonical_url_edge_cases(spark):
    """Operator-grade edges: malformed/NULL URLs canonicalize to NULL
    (try_parse_url — plain parse_url would RAISE under ANSI and kill the
    job on one bad crawl row), pathless URLs keep an empty path instead
    of nulling the concat, root-slash equals bare host, and value-less
    trackers are stripped."""
    rows = [
        (1, "https://ex.com?a=1", "https://ex.com?a=1"),
        (2, "https://ex.com", "https://ex.com"),
        (3, "https://ex.com/", "https://ex.com"),
        (4, "not a url", None),
        (5, None, None),
        (6, "https://ex.com/p?utm_source", "https://ex.com/p"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in rows], "i long, url string"
    )
    got = {r.i: r.c for r in df.select("i", canonical_url("url").alias("c")).collect()}
    assert got == {i: c for i, _, c in rows}


def test_canonical_url_port_policy(spark):
    """The explicit port-tail decisions (ADVICE r11): defaults drop
    (including http-on-443, deliberately folded once the scheme
    normalizes), real ports [1, 65535] stay, a bare ':' means default per
    RFC 3986, and unroutable tails — port 0, out-of-range, non-numeric,
    overflow-length digits — QUARANTINE to NULL instead of silently
    merging with the portless spelling. Userinfo colons are never
    mistaken for ports; IPv6 brackets don't false-positive the tail."""
    rows = [
        (1, "http://ex.com:443/a", "https://ex.com/a"),
        (2, "https://ex.com:080/x", "https://ex.com/x"),
        (3, "https://ex.com:8080/x", "https://ex.com:8080/x"),
        (4, "https://ex.com:65535/x", "https://ex.com:65535/x"),
        (5, "https://ex.com:/x", "https://ex.com/x"),
        (6, "https://ex.com:0/x", None),
        (7, "https://ex.com:00/x", None),
        (8, "https://ex.com:8a/x", None),
        (9, "https://ex.com:65536/x", None),
        (10, "https://ex.com:999999999999999999999/x", None),
        (11, "https://user:pw@ex.com/x", "https://ex.com/x"),
        (12, "https://user:pw@ex.com:7000/x", "https://ex.com:7000/x"),
        (13, "https://user:pw@ex.com:8b/x", None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in rows], "i long, url string"
    )
    got = {r.i: r.c for r in df.select("i", canonical_url("url").alias("c")).collect()}
    assert got == {i: c for i, _, c in rows}


def _py_intradoc(texts: dict[int, str], k: int) -> dict[int, tuple]:
    """Pure-Python reference of intradoc_dedup_rebuild."""
    out = {}
    for did, text in texts.items():
        toks = text.strip().lower().split()
        passages = [
            " ".join(toks[i : i + k]) for i in range(0, max(len(toks), 1), k)
        ]
        seen, kept = set(), []
        for p in passages:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[did] = (len(passages), len(kept), " ".join(kept))
    return out


def test_intradoc_dedup_matches_python_reference_random(spark):
    """Hypothesis sweep: random small-vocabulary docs (repeats are likely
    by construction) against the pure-Python first-in-doc-occurrence
    reference — the operator's rule, not just its happy path."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(["a", "b", "cc", "dd"])

    @settings(
        max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(
        docs=st.lists(
            st.lists(word, min_size=0, max_size=30), min_size=1, max_size=6
        )
    )
    def run(docs):
        texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_passages, r.n_kept, r.deduped_text)
            for r in intradoc_dedup_rebuild(df, passage_tokens=3).collect()
        }
        assert got == _py_intradoc(texts, 3)

    run()


def test_canonical_url_scheme_defaulting(spark):
    """Scheme-less and protocol-relative spellings (ubiquitous in crawl
    data) default to https instead of quarantining; non-web schemes
    (mailto:) quarantine via their NULL host rather than masquerading as
    pages."""
    cases = [
        ("ex.com/a?utm_source=x&p=1", "https://ex.com/a?p=1"),
        ("//WWW.ex.com/a/", "https://ex.com/a"),
        ("mailto:x@y.z", None),
        ("https://ex.com/a?p=1", "https://ex.com/a?p=1"),
        # authority-carrying non-web schemes quarantine OUTRIGHT — they
        # would otherwise parse a real host and cross-protocol-dedup
        # against the https page at the same path
        ("ftp://ex.com/f", None),
        ("ws://ex.com/s", None),
        ("FTP://ex.com/f", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [c for _, c in cases]
