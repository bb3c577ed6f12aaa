"""Operator-level tests for curation wave 2 (catalog oracle tests cover the
end-to-end queries; these pin edge-case semantics the oracle data may not
exercise)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.curation import (
    decontaminate,
    eval_gram_set,
    pii_counts,
    pii_redact,
    repetition_stats,
    semantic_dedup_verdicts,
)
from schwab_elt_etl_pipeline_spark.operators.rollup import (
    bucket_ts,
    rollup_coarser,
    rollup_minutes,
    rollup_read,
)


def test_decontaminate_short_doc_keeps_row(spark):
    """Docs shorter than n tokens have zero n-grams: they must still appear,
    uncontaminated — not vanish in the explode."""
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "xy")], "doc_id long, text string"
    )
    evald = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    out = decontaminate(train, eval_gram_set(evald, n=3), n=3, threshold=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_grams"] == 0 and rows[2]["contaminated"] == 0
    # doc 1 grams: {a b c, b c d, c d e}; eval set {a b c} -> overlap 1/3
    assert rows[1]["n_grams"] == 3 and rows[1]["n_hit"] == 1
    assert abs(rows[1]["overlap"] - 1 / 3) < 1e-6 and rows[1]["contaminated"] == 0


def test_repetition_stats_flags_repeats(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["top_token_frac"] == 1.0
    assert rows[1]["dup_2gram_frac"] == pytest.approx(2 / 3)
    assert rows[1]["repetitive"] == 1
    assert rows[2]["top_token_frac"] == pytest.approx(0.2)
    assert rows[2]["repetitive"] == 0


def test_pii_redact_and_counts(spark):
    df = spark.createDataFrame(
        [("mail a.b+c@x.co call 555-123-4567 or 555.987.6543 ssn 123-45-6789",)],
        "s string",
    )
    row = df.select(
        pii_redact("s").alias("red"), *pii_counts("s")
    ).first()
    assert row["red"] == "mail <EMAIL> call <PHONE> or <PHONE> ssn <SSN>"
    assert (row["n_email"], row["n_phone"], row["n_ssn"]) == (1, 2, 1)


def test_semantic_dedup_keeps_first_of_identical(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),     # dup of 1
            (3, [0.0, 1.0]),     # orthogonal -> kept
            (4, [0.99, 0.01]),   # near-dup of 1 (cos ~ 0.9999)
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in semantic_dedup_verdicts(df, band=20, threshold=0.9).collect()}
    assert rows[1]["kept"] == 1 and rows[1]["dup_of"] == -1
    assert rows[2]["kept"] == 0 and rows[2]["dup_of"] == 1
    assert rows[3]["kept"] == 1
    assert rows[4]["kept"] == 0 and rows[4]["dup_of"] == 1


def test_rollup_cascade_equals_direct(spark, sf_dir):
    """1min→5min→1h cascade must be bit-identical to a direct 1-hour rollup
    (decimal partials make re-aggregation exact)."""
    from schwab_elt_etl_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    cascade = rollup_read(
        rollup_coarser(
            rollup_coarser(rollup_minutes(ev, ["event_type"]), ["event_type"], 5),
            ["event_type"],
            60,
        )
    )
    direct = rollup_read(rollup_minutes(ev, ["event_type"], minutes=60))
    assert cascade.exceptAll(direct).count() == 0
    assert direct.exceptAll(cascade).count() == 0


def test_bucket_ts_rejects_non_nesting_grain(spark):
    with pytest.raises(ValueError):
        bucket_ts("ts", 7)
    with pytest.raises(ValueError):
        bucket_ts("ts", 90)


@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_pii_redaction_is_complete_property(spark):
    """Completeness: after redaction, NO pattern matches remain — for
    adversarial inputs (pattern fragments, overlaps, unicode, adjacency),
    not just the well-formed synthetic rows the oracle covers."""
    from hypothesis import given, settings, strategies as st

    fragments = st.sampled_from([
        "a@b.co", "x.y+z@mail.example.com", "@@", "a@b", ".com", "555-123-4567",
        "555.123.4567", "555 123 4567", "123-45-6789", "12-345-6789",
        "9555-123-45678", "text", "ünïcodé", "\n", " ", "123-45-678",
        "user@sub.domain.org9", "1@2.aa",
    ])

    @settings(max_examples=20, deadline=None)
    @given(st.lists(fragments, min_size=1, max_size=8))
    def check(parts):
        s = " ".join(parts)
        from schwab_elt_etl_pipeline_spark.operators.curation import (
            EMAIL_RE, PHONE_RE, SSN_RE, pii_redact,
        )

        df = spark.createDataFrame([(s,)], "s string")
        row = df.select(
            pii_redact("s").alias("red"),
            F.regexp_count(pii_redact("s"), F.lit(EMAIL_RE)).alias("e"),
            F.regexp_count(pii_redact("s"), F.lit(PHONE_RE)).alias("p"),
            F.regexp_count(pii_redact("s"), F.lit(SSN_RE)).alias("n"),
        ).first()
        assert (row["e"], row["p"], row["n"]) == (0, 0, 0), (s, row["red"])

    check()


def test_boilerplate_scrub_removes_from_every_doc_including_first(spark):
    """The frequency rule excises a recurring line from ALL documents (no
    first-occurrence survivor — the semantic difference vs passage dedup),
    keeps rare lines, and a doc that loses everything survives with empty
    text."""
    from schwab_elt_etl_pipeline_spark.operators.curation import (
        boilerplate_scrub,
    )

    footer = "cookie banner"
    rows = [
        (1, f"unique alpha {footer}"),
        (2, f"other beta {footer}"),
        (3, f"third gamma {footer}"),
        (4, footer),  # nothing but boilerplate
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in boilerplate_scrub(docs, passage_tokens=2, min_docs=3).collect()
    }
    assert out[1] == ("unique alpha", 2, 1)
    assert out[2] == ("other beta", 2, 1)
    assert out[3] == ("third gamma", 2, 1)
    assert out[4] == ("", 1, 1)  # survives, empty — caller's length gate decides


def test_boilerplate_scrub_relative_threshold_matches_absolute(spark):
    """min_docs_per computes greatest(min_docs, n_docs div per) in-plan:
    with 4 docs and per=2 the threshold is 2, so a line shared by exactly
    2 docs is scrubbed — identical output to the absolute form."""
    from schwab_elt_etl_pipeline_spark.operators.curation import (
        boilerplate_scrub,
    )

    rows = [
        (1, "shared pair one two"),
        (2, "shared pair three four"),
        (3, "five six seven eight"),
        (4, "nine ten eleven twelve"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rel = boilerplate_scrub(docs, passage_tokens=2, min_docs=1, min_docs_per=2)
    ab = boilerplate_scrub(docs, passage_tokens=2, min_docs=2)
    assert sorted(map(tuple, rel.collect())) == sorted(map(tuple, ab.collect()))
    got = {r.doc_id: r.text for r in rel.collect()}
    assert got[1] == "one two" and got[2] == "three four"
    assert got[3] == "five six seven eight"


def test_semantic_decontam_flags_only_close_vectors(spark):
    """A training vector aligned with an eval anchor is contaminated (with
    the hit count), an orthogonal one is absent from the output."""
    from schwab_elt_etl_pipeline_spark.operators.curation import (
        semantic_decontam,
    )

    evalset = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.8, 0.6, 0.0])],
        "vec_id long, embedding array<double>",
    )
    train = spark.createDataFrame(
        [
            (1, [2.0, 0.0, 0.0]),   # cos 1.0 to eval 100, 0.8 to eval 101
            (2, [0.0, 0.0, 5.0]),   # orthogonal to both
            (3, [0.0, 1.0, 0.0]),   # cos 0.6 to eval 101 only
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.max_cos, r.n_hits)
        for r in semantic_decontam(train, evalset, threshold=0.5).collect()
    }
    assert out == {1: (1.0, 2), 3: (0.6, 1)}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=8
        ).map(" ".join),
        min_size=1,
        max_size=10,
    ),
    min_docs=st.integers(min_value=2, max_value=4),
)
def test_boilerplate_scrub_matches_python_reference(spark, texts, min_docs):
    """Spark frequency rule == a sequential Python reference: chunk into
    2-token lines, count distinct docs per line, excise lines at df >=
    min_docs from every doc, rebuild in position order."""
    from schwab_elt_etl_pipeline_spark.operators.curation import (
        boilerplate_scrub,
    )

    docs = list(enumerate(texts))

    def lines_of(text):
        toks = text.split()
        return [" ".join(toks[i : i + 2]) for i in range(0, len(toks), 2)]

    df = {}
    for i, t in docs:
        for ln in set(lines_of(t)):
            df[ln] = df.get(ln, 0) + 1
    want = {}
    for i, t in docs:
        lns = lines_of(t)
        kept = [ln for ln in lns if df[ln] < min_docs]
        want[i] = (" ".join(kept), len(lns), len(lns) - len(kept))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text, r.n_lines, r.n_removed)
        for r in boilerplate_scrub(
            sdf, passage_tokens=2, min_docs=min_docs
        ).collect()
    }
    assert got == want
