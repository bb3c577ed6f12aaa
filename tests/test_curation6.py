"""Curation wave 6 units: registrable-domain extraction, domain-gate
arithmetic + verdict precedence, unicode-scrub rules/ordering/fixpoint, and
the NFC slow path (the catalog oracles cover the end-to-end queries; these
pin the operator rules on hand-built cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.domains import (
    blocklist_df,
    domain_quality_gate,
    domain_stats,
    registrable_domain,
)
from schwab_elt_etl_pipeline_spark.operators.textnorm import (
    NORM_RULES,
    nfc_normalize_pandas,
    norm_sql_exprs,
    unicode_scrub,
)


def test_registrable_domain_branches(spark):
    cases = [
        ("example.com", "example.com"),
        ("blog.example.com", "example.com"),
        ("a.b.example.com", "example.com"),
        # multi-part second-level family under a short TLD -> 3 labels
        ("example.co.uk", "example.co.uk"),
        ("blog.example.co.uk", "example.co.uk"),
        ("a.b.example.ac.jp", "example.ac.jp"),
        # 'co' under a LONG final label is NOT a suffix family
        ("x.co.example", "co.example"),
        # exactly the family pair with nothing above it: nothing to widen
        ("co.uk", "co.uk"),
        # single-label (intranet) hosts pass through
        ("localhost", "localhost"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, host string"
    )
    got = {
        r.i: r.d
        for r in df.select("i", registrable_domain("host").alias("d")).collect()
    }
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)


def test_domain_stats_exact_arithmetic(spark):
    # domain A: 4 docs over 2 pages -> dup_rate 0.5; weights sum 10/scale 4
    # domain B: 1 doc, 1 page -> dup_rate 0.0
    rows = [
        ("a.com", "u1", 1),
        ("a.com", "u1", 2),
        ("a.com", "u2", 3),
        ("a.com", "u2", 4),
        ("b.com", "u9", 2),
    ]
    df = spark.createDataFrame(
        rows, "domain string, canonical_url string, q_weight int"
    )
    got = {
        r.domain: r.asDict()
        for r in domain_stats(df, quality_scale=4).collect()
    }
    assert got["a.com"]["n_docs"] == 4 and got["a.com"]["n_pages"] == 2
    assert got["a.com"]["dup_rate"] == 0.5
    assert got["a.com"]["mean_quality"] == 10 / 16  # sum 10 / (4 docs * 4)
    assert got["b.com"]["dup_rate"] == 0.0
    assert got["b.com"]["mean_quality"] == 0.5


def test_domain_gate_verdict_precedence(spark):
    stats = spark.createDataFrame(
        [
            # blocked wins even though it is ALSO a dup farm
            ("spam.example", 100, 2, 0.98, 0.9),
            ("tiny.example", 2, 2, 0.0, 0.9),
            ("mirror.example", 50, 5, 0.9, 0.9),
            ("junk.example", 50, 50, 0.0, 0.1),
            ("good.example", 50, 50, 0.0, 0.9),
        ],
        "domain string, n_docs long, n_pages long, dup_rate double, "
        "mean_quality double",
    )
    bl = blocklist_df(spark, [("spam.example", "listed")])
    got = {
        r.domain: (r.verdict, r.block_reason)
        for r in domain_quality_gate(
            stats, bl, min_docs=3, max_dup_rate=0.5, min_quality=0.3
        ).collect()
    }
    assert got["spam.example"] == ("blocked", "listed")
    assert got["tiny.example"] == ("small", None)
    assert got["mirror.example"] == ("dup_farm", None)
    assert got["junk.example"] == ("low_quality", None)
    assert got["good.example"] == ("keep", None)


def test_apply_domain_gate_purges_by_verdict(spark):
    from schwab_elt_etl_pipeline_spark.operators.domains import (
        apply_domain_gate,
    )

    docs = spark.createDataFrame(
        [(1, "good.example"), (2, "spam.example"), (3, "good.example"),
         (4, "mirror.example")],
        "doc_id long, domain string",
    )
    verdicts = spark.createDataFrame(
        [("good.example", "keep"), ("spam.example", "blocked"),
         ("mirror.example", "dup_farm")],
        "domain string, verdict string",
    )
    kept = {r.doc_id for r in apply_domain_gate(docs, verdicts).collect()}
    assert kept == {1, 3}
    # the purge is a broadcast semi-join — the corpus never shuffles
    plan = apply_domain_gate(docs, verdicts)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_domain_gate_blocklist_is_broadcast(spark):
    stats = spark.createDataFrame(
        [("a.com", 10, 10, 0.0, 0.9)],
        "domain string, n_docs long, n_pages long, dup_rate double, "
        "mean_quality double",
    )
    plan = domain_quality_gate(
        stats, blocklist_df(spark, [("x.com", "r")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# unicode scrub
# ---------------------------------------------------------------------------

SAMPLES = [
    (0, "plain ascii text"),
    (1, "mojibake: itâ€™s â€œquotedâ€“ish Ã©tude Â glued"),
    (2, "zw:​a‌b‍c⁠d﻿e end"),
    (3, "ctrl:\x01\x02 tab\there\x7f\x9d keep \t\n intact"),
    (4, "sp:   　| ‘q’ “d” "
        "–—― … done"),
    (5, "runs:   a    b  c"),
    (6, None),
    (7, ""),
]


def test_unicode_scrub_matches_duckdb_re2(spark):
    """Differential Java-vs-RE2 portability sweep: every rule pattern must
    count and rewrite identically under Spark (Java regex) and DuckDB
    (RE2), including the \\x{...} codepoint escapes."""
    import duckdb

    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in unicode_scrub(df).collect()}

    con = duckdb.connect()
    counts, clean = norm_sql_exprs("text")
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", SAMPLES)
    cols = ",\n".join(counts)
    oracle = {
        r[0]: r
        for r in con.execute(
            f"SELECT doc_id, {cols}, {clean} AS clean_text FROM t"
        ).fetchall()
    }
    names = [f"n_{n}" for n, _, _ in NORM_RULES] + ["clean_text"]
    for i, _ in SAMPLES:
        assert [got[i][c] for c in names] == list(oracle[i][1:]), i


def test_unicode_scrub_rule_semantics(spark):
    cases = {
        # mojibake repairs land their ASCII/repaired forms
        "itâ€™s": "it's",
        "â€œqâ€“": '"q-',
        "Ã©tude": "étude",
        # tab and newline SURVIVE the control strip; \x01 is removed
        "a\tb\nc\x01d": "a\tb\ncd",
        # folds
        "‘x’ “y” – …": "'x' \"y\" - ...",
        # substitution-created adjacency collapses: two ideographic spaces
        # become two spaces become one
        "a　　b": "a b",
        "": "",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r.clean_text for r in unicode_scrub(df).collect()}
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == want, (repr(src), repr(got[i]), repr(want))


def test_unicode_scrub_sequential_counts(spark):
    """Ordering contract: a span consumed by an earlier rule never books
    under a later one. 'Â '+NBSP is ONE mojibake repair, not a space fold;
    the space it leaves joins the run collapse."""
    df = spark.createDataFrame(
        [(0, "x Â\u00a0 y"), (1, "p\u00a0q")], "doc_id long, text string"
    )
    got = {r.doc_id: r.asDict() for r in unicode_scrub(df).collect()}
    assert got[0]["n_moji_nbsp"] == 1
    assert got[0]["n_space_fold"] == 0  # the NBSP was already consumed
    assert got[0]["n_space_runs"] == 1  # 'x ' + repair-space collapse
    assert got[0]["clean_text"] == "x y"
    assert got[1]["n_moji_nbsp"] == 0 and got[1]["n_space_fold"] == 1
    assert got[1]["clean_text"] == "p q"


def test_unicode_scrub_is_fixpoint(spark):
    """Re-scrubbing already-clean text is the identity — the cascade's
    output alphabet contains no pattern of any rule (so an incremental
    pipeline can re-run the stage safely)."""
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    once = unicode_scrub(df).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = unicode_scrub(once)
    for r in twice.collect():
        counts = [v for k, v in r.asDict().items() if k.startswith("n_")]
        assert set(counts) <= {0, None}, r


def test_unicode_scrub_zero_shuffles(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string")
    plan = unicode_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_unicode_scrub_property_sweep_vs_re2(spark):
    """Hypothesis sweep of the Java-vs-RE2 portability claim: randomized
    strings over an alphabet salted with every rule's trigger characters
    (mojibake fragments, zero-widths, controls, exotic spaces, curly
    punctuation, space runs — including PARTIAL mojibake sequences, which
    must fall through to the char-level folds identically in both
    engines)."""
    import duckdb

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    atom = st.sampled_from(
        [
            "a", " ", "  ", "â€™", "â€œ", "â€“", "Ã©", "Â ",
            # partial mojibake: the lead bytes WITHOUT their tails
            "â€", "â", "Ã", "Â",
            "​", "⁠", "﻿", "\x01", "\x9d", "\t",
            " ", "　", "’", "“", "—", "…",
        ]
    )
    con = duckdb.connect()
    counts, clean = norm_sql_exprs("t")
    cols = ",\n".join(counts)
    names = [f"n_{n}" for n, _, _ in NORM_RULES] + ["clean_text"]

    @settings(
        max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
    )
    @given(parts=st.lists(atom, min_size=0, max_size=24))
    def run(parts):
        text = "".join(parts)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = unicode_scrub(df).collect()[0].asDict()
        oracle = con.execute(
            f"SELECT {cols}, {clean} AS clean_text FROM (SELECT ? AS t)",
            [text],
        ).fetchone()
        assert [got[c] for c in names] == list(oracle), repr(text)

    run()


def test_html_strip_rules(spark):
    from schwab_elt_etl_pipeline_spark.operators.textnorm import html_strip

    cases = {
        # script/style payloads drop WHOLESALE (their text is not corpus
        # text — a tag-only strip would leak 'var a = ...' into the doc)
        # (removals fold to ' ' — boundary spaces are kept: trimming is a
        # downstream decision, and the run collapse only merges runs)
        "<script>var a='<p>';</script>keep<style>.x{}</style>": " keep ",
        "<SCRIPT\nsrc='x'>a</SCRIPT>up": " up",  # case + multiline
        "<!-- c -->a<b>bold</b>": " a bold ",
        # &amp; unescapes LAST: '&amp;lt;' is the literal '&lt;', not '<'
        "a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f":
            'a &lt; b <c> "d" \'e\' f',
        # UNCLOSED script/style (ADVICE r12): truncated crawl HTML must
        # not leak raw JS/CSS into clean_text — the tail rules drop the
        # payload to end of text
        "unclosed <script>var leak = 1;": "unclosed ",
        "keep <STYLE media='x'>.a{color:red": "keep ",
        "a<script>x</script>b<script>tail forever": "a b ",
        "": "",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {r.doc_id: r.clean_text for r in html_strip(df).collect()}
    for i, (src, want) in enumerate(cases.items()):
        assert got[i] == want, (repr(src), repr(got[i]), repr(want))


def test_html_strip_matches_duckdb_re2(spark):
    """Differential Java-vs-RE2 sweep for the HTML rules (lazy quantifiers
    and inline (?is) flags are the portability risk here)."""
    import duckdb

    from schwab_elt_etl_pipeline_spark.operators.textnorm import (
        HTML_RULES,
        html_sql_exprs,
        html_strip,
    )

    samples = [
        (0, "plain"),
        (1, "<p>Hello <b>world</b></p>"),
        (2, "<SCRIPT type='x'>var a = '<p>';</SCRIPT>keep<style>.a{}</style>"),
        (3, "<!-- n --><div class='x'>a &amp; b &lt;t&gt;&nbsp;e</div>"),
        (4, "lone < bracket > eats"),
        (5, "<a\nhref='x'>multi\nline</a>"),
        (6, None),
        (7, "unclosed <script>never ends"),
    ]
    df = spark.createDataFrame(samples, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in html_strip(df).collect()}
    con = duckdb.connect()
    counts, clean = html_sql_exprs("text")
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", samples)
    cols = ",\n".join(counts)
    oracle = {
        r[0]: r
        for r in con.execute(
            f"SELECT doc_id, {cols}, {clean} AS clean_text FROM t"
        ).fetchall()
    }
    names = [f"n_{n}" for n, _, _ in HTML_RULES] + ["clean_text"]
    for i, _ in samples:
        assert [got[i][c] for c in names] == list(oracle[i][1:]), i


def test_nfc_pandas_matches_duckdb(spark):
    """The documented NFC slow path (Arrow-batched pandas UDF over
    unicodedata) agrees with DuckDB's ICU-backed nfc_normalize."""
    import duckdb

    rows = [
        (0, "café composed vs café"),
        (1, "å ring, ö umlaut"),
        (2, "already nfc"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in nfc_normalize_pandas(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.execute("SELECT doc_id, nfc_normalize(text) FROM t").fetchall())
    assert got == want
