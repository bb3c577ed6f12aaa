"""Curation wave 5 units: PII scrub class rules + ordering, SemDeDup
keep-first pruning, deterministic ppm sampling (the catalog oracles cover
the end-to-end queries; these pin the operator rules on hand-built cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.pii import PII_RULES, pii_scrub
from schwab_elt_etl_pipeline_spark.operators.semdedup import semdedup_prune
from schwab_elt_etl_pipeline_spark.operators.sharding import (
    _KNUTH,
    _MASK32,
    keep_ppm,
)


def test_pii_scrub_classes_and_order(spark):
    cases = [
        # (text, n_email, n_card, n_ip, n_phone, scrubbed)
        ("mail a.b+c@ex.co.uk now", 1, 0, 0, 0, "mail <EMAIL> now"),
        ("pay 4111-1111-1111-1234 ok", 0, 1, 0, 0, "pay <CARD> ok"),
        ("pay 4111 1111 1111 1234 ok", 0, 1, 0, 0, "pay <CARD> ok"),
        ("from 10.0.255.7 in", 0, 0, 1, 0, "from <IP> in"),
        ("call 555-123-4567", 0, 0, 0, 1, "call <PHONE>"),
        ("call +555.123.4567", 0, 0, 0, 1, "call <PHONE>"),
        # ADVICE r11: parenthesized spelling covered; ADVICE r12: space
        # separators only behind a '(ddd)' or '+' phone signal
        ("call (555) 123-4567", 0, 0, 0, 1, "call <PHONE>"),
        ("call (555) 123 4567 now", 0, 0, 0, 1, "call <PHONE> now"),
        ("call +555 123 4567 now", 0, 0, 0, 1, "call <PHONE> now"),
        # bare space triples are numeric prose, NOT phones (ADVICE r12)
        ("call 555 123 4567 now", 0, 0, 0, 0, "call 555 123 4567 now"),
        ("sizes 512 768 1024 end", 0, 0, 0, 0, "sizes 512 768 1024 end"),
        # bare mixed separators fail the consistency contract
        ("x 555-123.4567 y", 0, 0, 0, 0, "x 555-123.4567 y"),
        # 10 contiguous digits are EXPLICITLY out of contract (ids, not PII)
        ("id 5551234567", 0, 0, 0, 0, "id 5551234567"),
        # ORDER pins: a card is ONE card, not a phone nibble; a dotted
        # phone (4-digit tail) is NOT an IPv4; an IP is not a phone
        ("4111-1111-1111-1234", 0, 1, 0, 0, "<CARD>"),
        ("555.123.4567", 0, 0, 0, 1, "<PHONE>"),
        ("1.2.3.4", 0, 0, 1, 0, "<IP>"),
        # glued digits don't half-match (word boundaries)
        ("id 91234-5678-9012-34561", 0, 0, 0, 0, "id 91234-5678-9012-34561"),
        ("two a@b.io c@d.ai", 2, 0, 0, 0, "two <EMAIL> <EMAIL>"),
        ("", 0, 0, 0, 0, ""),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_) in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_email, r.n_card, r.n_ip, r.n_phone, r.scrubbed_text)
        for r in pii_scrub(df).collect()
    }
    for i, (_, *want) in enumerate(cases):
        assert got[i] == tuple(want), (i, cases[i][0], got[i])


def test_pii_scrub_null_text_propagates(spark):
    """SQL-standard NULL propagation: a NULL text yields NULL counts and a
    NULL scrubbed text (the caller quarantines, the operator doesn't guess)."""
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = pii_scrub(df).collect()[0]
    assert (r.n_email, r.n_card, r.n_ip, r.n_phone, r.scrubbed_text) == (
        None, None, None, None, None,
    )


def test_pii_rules_portable_regex_core():
    """The Java/RE2 portability contract: no lookarounds, no backrefs, no
    possessive quantifiers, no single quotes (patterns embed in SQL)."""
    for _, pat, _ in PII_RULES:
        for banned in ("(?=", "(?!", "(?<", "\\1", "*+", "++", "'"):
            assert banned not in pat, (pat, banned)


def test_semdedup_keep_first_by_id(spark):
    # 2-d embeddings, k=2 cells seeded by vec 0 (x-axis) and vec 1 (y-axis):
    # 0,2,3 land in cell 0; 1,4 in cell 1. 2 and 3 duplicate 0 (cos=1 after
    # rounding); 4 is near-orthogonal to 1 -> kept.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [2.0, 0.0]),
        (3, [5.0, 0.0]),
        (4, [0.3, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cluster, r.is_dup, r.dup_of)
        for r in semdedup_prune(df, k=2, tau=0.99).collect()
    }
    assert got[0] == (0, 0, -1)
    assert got[2] == (0, 1, 0)  # dup_of = SMALLEST lower id in range
    assert got[3] == (0, 1, 0)
    assert got[1] == (1, 0, -1)
    assert got[4] == (1, 0, -1)  # same cell, below tau: kept


def test_semdedup_no_cross_cell_pruning(spark):
    """Identical vectors in DIFFERENT cells are never compared — the cell
    is the candidate boundary (that's the scale contract)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        # 2 is identical to 0 but steered into cell 1 by a big y-component?
        # No — use a vector equidistant-ish but assigned to cell 1:
        (2, [0.1, 1.0]),
        (3, [0.1, 1.0]),  # identical to 2, same cell -> dup of 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.cluster, r.is_dup, r.dup_of)
        for r in semdedup_prune(df, k=2, tau=0.999999).collect()
    }
    assert got[2] == (1, 0, -1)
    assert got[3] == (1, 1, 2)
    assert got[0][1] == 0 and got[1][1] == 0


def test_semdedup_zero_norm_vectors_are_inert(spark):
    """A zero-norm embedding has no direction, hence no cosine: it must be
    a keeper itself AND never count as evidence against a later member
    (without the pair-stage guard, its NaN cosine — which Spark orders
    above every number — would flag it as a duplicate of every lower-id
    cell member and flag every higher-id member as its duplicate)."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.0, 0.0]),  # zero vector (lands in cell 0 by NaN tie-break)
        (3, [3.0, 0.0]),  # true dup of 0 — dup_of must be 0, not 2
        (4, [0.0, 0.0]),  # second zero vector: not a dup of the first
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: (r.is_dup, r.dup_of)
        for r in semdedup_prune(df, k=2, tau=0.9).collect()
    }
    assert got[2] == (0, -1)
    assert got[4] == (0, -1)
    assert got[3] == (1, 0)
    assert got[0] == (0, -1) and got[1] == (0, -1)


def test_semdedup_zero_norm_seed_never_becomes_centroid(spark):
    """Regression (ADVICE r12): a zero-norm vector with id < k must be
    excluded from the seed centroids — its assignment-stage cosine is NULL
    in Spark (orders LAST under DESC) but NaN in DuckDB's float division
    (orders FIRST), so keeping it as a centroid diverges the engines.
    Differential: Spark operator vs the catalog's DuckDB oracle SQL."""
    import duckdb
    import pandas as pd

    from schwab_elt_etl_pipeline_spark.catalog.curation5 import SEMDEDUP_SQL
    from schwab_elt_etl_pipeline_spark.operators.semdedup import seed_centroids

    rows = [
        (0, [0.0, 0.0]),  # zero-norm SEED — must not become a centroid
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 2.0]),  # dup of 1 in whichever cell both land in
        (4, [0.0, 0.0]),  # zero vector member: keeper, never evidence
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert [r.cent_id for r in seed_centroids(df, k=2).collect()] == [1]

    got = sorted(
        (r.vec_id, r.cluster, r.is_dup, r.dup_of)
        for r in semdedup_prune(df, k=2, tau=0.9).collect()
    )
    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    sql = SEMDEDUP_SQL.replace("vec_id < 8", "vec_id < 2").replace(
        ">= 0.35", ">= 0.9"
    )
    want = sorted(
        (int(a), int(b), int(c), int(d)) for a, b, c, d in con.sql(sql).fetchall()
    )
    assert got == want
    by_id = {v: (c, d, o) for v, c, d, o in got}
    assert by_id[3] == (1, 1, 1)  # 3 dups 1 inside the single surviving cell
    assert by_id[0][1] == 0 and by_id[4][1] == 0  # zero vectors are keepers


def test_keep_ppm_matches_python_and_salting(spark):
    ids = list(range(2000))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")

    def py_keep(i, rate, salt):
        return ((i + salt) * _KNUTH & _MASK32) % 1_000_000 < rate

    for rate, salt in ((250_000, 0), (250_000, 101), (937_000, 7)):
        got = sorted(
            r.doc_id
            for r in df.where(keep_ppm("doc_id", rate, salt)).collect()
        )
        want = sorted(i for i in ids if py_keep(i, rate, salt))
        assert got == want, (rate, salt, len(got), len(want))
        # rate is honored within sampling noise on 2000 uniform hashes
        assert abs(len(got) / len(ids) - rate / 1e6) < 0.05
    # degenerate rates are exact
    assert df.where(keep_ppm("doc_id", 0)).count() == 0
    assert df.where(keep_ppm("doc_id", 1_000_000)).count() == len(ids)
    # salting decorrelates: the two 25% samples differ
    s0 = {r.doc_id for r in df.where(keep_ppm("doc_id", 250_000, 0)).collect()}
    s1 = {
        r.doc_id for r in df.where(keep_ppm("doc_id", 250_000, 101)).collect()
    }
    assert s0 != s1


def test_pii_rules_agree_across_java_and_re2(spark):
    """The portability contract, tested differentially: the SAME pattern
    strings must produce the SAME counts and scrubbed text under Java
    regex (Spark executors) and RE2 (the DuckDB oracle) — on randomized
    adversarial inputs (PII snippets glued to digits/words/punctuation,
    multiple classes per line, boundary-probing fragments), not just the
    catalog's synthesized rows."""
    import random

    import duckdb

    from schwab_elt_etl_pipeline_spark.operators.pii import (
        pii_count_sql_exprs,
    )

    rng = random.Random(7)
    frags = [
        "a.b+c@ex.co.uk", "x@y.io", "not@an", "@@", "a@b.c",  # email edges
        "4111-1111-1111-1234", "4111 1111 1111 1234", "94111-1111-1111-1234",
        "4111-1111-1111-12345", "555-123-4567", "+555.123.4567",
        "1555-123-4567", "555-123-45678", "10.0.255.7", "1.2.3.4567",
        "999.999.999.999", "1.2.3", "v1.2.3.4", "word", "42", "-", ".",
        "email:a@b.cd,", "(555.123.4567)", "ip=8.8.8.8;",
    ]
    rows = []
    for i in range(60):
        n = rng.randint(1, 6)
        rows.append((i, " ".join(rng.choice(frags) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_email, r.n_card, r.n_ip, r.n_phone, r.scrubbed_text)
        for r in pii_scrub(df).collect()
    }
    counts, scrubbed = pii_count_sql_exprs("text")
    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(rows, columns=["doc_id", "text"]))
    want = {
        int(r[0]): (int(r[1]), int(r[2]), int(r[3]), int(r[4]), r[5])
        for r in con.sql(
            f"SELECT doc_id, {', '.join(counts)}, {scrubbed} AS s FROM docs"
        ).fetchall()
    }
    assert got == want
