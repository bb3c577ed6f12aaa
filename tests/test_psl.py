"""Public-suffix registrable-domain tests: the PSL algorithm against a
pure-Python reference, the emitted DuckDB oracle, the broadcast-join path,
and the documented divergences from the heuristic core."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.domains import registrable_domain
from schwab_elt_etl_pipeline_spark.operators.psl import (
    default_psl_rules,
    load_psl_rules,
    psl_rules_df,
    psl_sql_expr,
    registrable_domain_psl,
    with_registrable_domain_psl,
)

RULES = default_psl_rules()


def py_registrable(host: str) -> str | None:
    """Reference implementation straight from the publicsuffix.org spec."""
    labels = host.split(".")
    n = len(labels)

    def sfx(k: int) -> str:
        return ".".join(labels[n - k :])

    ps = None
    for k in range(n, 0, -1):  # exceptions prevail, any length
        if sfx(k) in RULES.exception:
            ps = k - 1
            break
    if ps is None:
        best = 1  # implicit '*' default rule
        for k in range(1, n + 1):
            if sfx(k) in RULES.exact:
                best = max(best, k)
            if k + 1 <= n and sfx(k) in RULES.wildcard:
                best = max(best, k + 1)
        ps = best
    if n >= ps + 1:
        return sfx(ps + 1)
    return None


HOSTS = [
    # plain gTLD / ccTLD
    "example.com", "www.example.com", "a.b.example.com", "example.de",
    # multi-part public suffixes
    "example.co.uk", "blog.example.co.uk", "a.b.example.gov.uk",
    "example.com.au", "shop.example.com.br", "x.example.co.jp",
    # the host IS a public suffix -> NULL
    "com", "co.uk", "github.io", "kobe.jp", "ck", "s3.amazonaws.com",
    # private-section suffixes (heuristic divergence cases)
    "user.github.io", "deep.user.github.io", "myblog.blogspot.com",
    "app.herokuapp.com", "bucket.s3.amazonaws.com", "site.pages.dev",
    # wildcard rules: *.kobe.jp, *.ck
    "foo.kobe.jp", "bar.foo.kobe.jp", "example.ck", "shop.example.ck",
    # exception rules: !city.kobe.jp, !www.ck
    "city.kobe.jp", "a.city.kobe.jp", "www.ck", "b.www.ck",
    # unknown TLD -> implicit '*' default
    "example.zz", "deep.example.zz", "spamnet.example",
    # single labels / intranet
    "localhost", "zz",
]


@pytest.fixture(scope="module")
def psl_df(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    return df.select(
        "host", registrable_domain_psl("host").alias("domain")
    )


def test_psl_expression_matches_python_reference(spark, psl_df):
    got = {r.host: r.domain for r in psl_df.collect()}
    for h in HOSTS:
        assert got[h] == py_registrable(h), h


def test_psl_expression_matches_duckdb_oracle(spark, psl_df):
    got = {r.host: r.domain for r in psl_df.collect()}
    con = duckdb.connect()
    con.register("hosts", pd.DataFrame({"host": HOSTS}))
    want = dict(
        con.sql(
            f"SELECT host, {psl_sql_expr('host')} AS d FROM hosts"
        ).fetchall()
    )
    assert got == want


def test_psl_join_path_matches_expression_path(spark, psl_df):
    want = {r.host: r.domain for r in psl_df.collect()}
    df = spark.createDataFrame([(h,) for h in HOSTS], "host string")
    joined = with_registrable_domain_psl(
        df, psl_rules_df(spark), host_col="host", out_col="domain"
    )
    got = {r.host: r.domain for r in joined.collect()}
    assert got == want


def test_psl_randomized_three_way_agreement(spark):
    """Property sweep: random hosts assembled from rule fragments + noise
    labels — expression path, join path, and the Python reference agree."""
    rng = random.Random(13)
    frags = sorted(RULES.exact | RULES.wildcard | RULES.exception)
    words = ["a", "bb", "ccc", "www", "city", "example", "x9", "sub"]
    hosts = []
    for _ in range(300):
        tail = rng.choice(frags)
        depth = rng.randint(0, 3)
        head = [rng.choice(words) for _ in range(depth)]
        hosts.append(".".join(head + [tail]))
    hosts += [".".join(rng.choices(words, k=rng.randint(1, 4))) for _ in range(50)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string").distinct()
    expr = {
        r.host: r.domain
        for r in df.select(
            "host", registrable_domain_psl("host").alias("domain")
        ).collect()
    }
    join = {
        r.host: r.domain
        for r in with_registrable_domain_psl(
            df, psl_rules_df(spark), host_col="host", out_col="domain"
        ).collect()
    }
    assert expr == join
    for h, d in expr.items():
        assert d == py_registrable(h), h


def test_psl_diverges_from_heuristic_where_it_should(spark):
    """The documented upgrade cases: private suffixes (*.github.io-style)
    and wildcard/exception rules, where the last-2/last-3 heuristic is
    wrong; plus agreement on the boring core where both are right."""
    cases = {
        # heuristic: github.io (treats io as the suffix); PSL: github.io IS
        # the suffix, so the user label is part of the registrable domain
        "user.github.io": ("user.github.io", "github.io"),
        "myblog.blogspot.com": ("myblog.blogspot.com", "blogspot.com"),
        "bucket.s3.amazonaws.com": ("bucket.s3.amazonaws.com", "amazonaws.com"),
        # wildcard *.ck: example.ck is itself a public suffix, so the
        # registrable domain takes one MORE label than the heuristic's 2
        "shop.example.ck": ("shop.example.ck", "example.ck"),
        # exception !www.ck
        "www.ck": ("www.ck", "www.ck"),
    }
    agree = ["example.com", "www.example.com", "blog.example.co.uk"]
    rows = [(h,) for h in list(cases) + agree]
    df = spark.createDataFrame(rows, "host string").select(
        "host",
        registrable_domain_psl("host").alias("psl"),
        registrable_domain("host").alias("heur"),
    )
    got = {r.host: (r.psl, r.heur) for r in df.collect()}
    for h, want in cases.items():
        assert got[h] == want, (h, got[h])
    for h in agree:
        assert got[h][0] == got[h][1], (h, got[h])


def test_psl_parser_reads_interchange_format(tmp_path):
    p = tmp_path / "mini.dat"
    p.write_text(
        "// comment\n\ncom\n*.ck\n!www.ck\n  co.uk  \n// tail comment\n"
    )
    r = load_psl_rules(str(p))
    assert r.exact == {"com", "co.uk"}
    assert r.wildcard == {"ck"}
    assert r.exception == {"www.ck"}
    # exact co.uk matches 2 labels; wildcard base 'ck' certifies 2; www.ck 2
    assert r.max_match_labels == 2


def test_default_rules_cover_committed_families():
    assert "co.uk" in RULES.exact and "github.io" in RULES.exact
    assert "ck" in RULES.wildcard and "kobe.jp" in RULES.wildcard
    assert "www.ck" in RULES.exception and "city.kobe.jp" in RULES.exception
    # join-path bound must cover the longest committed rule
    assert RULES.max_match_labels <= 5
