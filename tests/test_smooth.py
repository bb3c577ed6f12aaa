"""Unit tests for the chunked-exponent EWMA scan (operators/smooth.py).

The sequential recurrence ``y_1 = x_1; y_t = (1-a)*y_(t-1) + a*x_t`` is the
ground truth; the operator must reproduce it through chunked closed-form
windows + an affine carry fold, bit-close for any alpha, any chunking, and
across chunk boundaries. A null observation decays the state one step
without updating it (documented missing-tick semantics).
"""

from __future__ import annotations

import math

import pytest

from schwab_elt_etl_pipeline_spark.operators.smooth import _chunk_rows, ewma


def _sequential(xs, alpha):
    """Driver-side reference recurrence (None = missing observation)."""
    out, y = [], None
    for x in xs:
        if y is None:
            y = 0.0 if x is None else float(x)
        elif x is None:
            y = (1 - alpha) * y
        else:
            y = (1 - alpha) * y + alpha * float(x)
        out.append(y)
    return out


def _series(n, ent=0):
    return [(ent, i, math.sin(i * 0.7) * 100 + (i * 37 % 11)) for i in range(n)]


def _check(spark, rows, alpha, chunk_rows=None, rel=1e-9):
    df = spark.createDataFrame(rows, "ent int, t int, x double")
    got = (
        ewma(df, "x", ["ent"], ["t"], alpha, chunk_rows=chunk_rows)
        .select("ent", "t", "ewma")
        .collect()
    )
    by_ent = {}
    for ent, t, x in sorted(rows):
        by_ent.setdefault(ent, []).append(x)
    refs = {ent: _sequential(xs, alpha) for ent, xs in by_ent.items()}
    assert len(got) == len(rows)
    for r in got:
        want = refs[r.ent][r.t]
        assert r.ewma == pytest.approx(want, rel=rel, abs=1e-9), (
            f"ent={r.ent} t={r.t}: {r.ewma} != {want}"
        )


@pytest.mark.parametrize("alpha", [0.01, 0.25, 0.5, 0.97])
def test_matches_sequential_recurrence(spark, alpha):
    rows = _series(200, 0) + _series(57, 1) + [(2, 0, 42.0)]
    _check(spark, rows, alpha)


@pytest.mark.parametrize("chunk_rows", [1, 3, 7, 64])
def test_chunk_boundaries_are_invisible(spark, chunk_rows):
    _check(spark, _series(100), alpha=0.3, chunk_rows=chunk_rows)


def test_long_series_default_chunking_is_stable(spark):
    # 5000 rows at alpha=0.5 would need POWER(0.5, -5000) naively — the
    # chunk bound keeps every exponent small; values stay exact.
    _check(spark, _series(5000), alpha=0.5)


def test_null_decays_without_update(spark):
    rows = [(0, 0, 10.0), (0, 1, None), (0, 2, None), (0, 3, 20.0)]
    df = spark.createDataFrame(rows, "ent int, t int, x double")
    got = {r.t: r.ewma for r in ewma(df, "x", ["ent"], ["t"], 0.5).collect()}
    assert got[0] == pytest.approx(10.0)
    assert got[1] == pytest.approx(5.0)
    assert got[2] == pytest.approx(2.5)
    assert got[3] == pytest.approx(11.25)


def test_all_null_chunk_carries_state(spark):
    # chunk_rows=2 puts rows 2-3 (both null) in their own chunk: the fold
    # must decay the carry straight through the empty chunk.
    rows = [(0, 0, 8.0), (0, 1, None), (0, 2, None), (0, 3, None), (0, 4, 0.0)]
    df = spark.createDataFrame(rows, "ent int, t int, x double")
    got = {r.t: r.ewma for r in ewma(df, "x", ["ent"], ["t"], 0.5, chunk_rows=2).collect()}
    assert got[3] == pytest.approx(1.0)
    assert got[4] == pytest.approx(0.5)


def test_alpha_one_is_identity(spark):
    df = spark.createDataFrame([(0, 0, 3.0), (0, 1, 9.0)], "ent int, t int, x double")
    got = {r.t: r.ewma for r in ewma(df, "x", ["ent"], ["t"], 1.0).collect()}
    assert got == {0: 3.0, 1: 9.0}


def test_alpha_validation():
    with pytest.raises(ValueError):
        ewma(None, "x", ["e"], ["t"], 0.0)
    with pytest.raises(ValueError):
        ewma(None, "x", ["e"], ["t"], 1.5)


def test_chunk_rows_bound_is_safe():
    for alpha in (0.001, 0.01, 0.25, 0.5, 0.9, 0.999):
        b = _chunk_rows(alpha)
        assert 1 <= b <= 512
        # worst-case within-chunk power must stay far below double overflow
        assert -b * math.log(1.0 - alpha) <= 600.0 + 1e-9


def test_oversized_chunk_rows_is_clamped(spark):
    """A caller-supplied chunk_rows past the numeric-safety bound must be
    clamped, not overflow pow(decay, -j) to inf and yield silent NaNs."""
    alpha = 0.01  # safe bound ~ 512; chunk_rows=100000 would overflow doubles
    _check(spark, _series(2000), alpha=alpha, chunk_rows=100_000, rel=1e-7)


def test_unsorted_input_and_extra_columns(spark):
    rows = [(0, t, float(t), f"tag{t}") for t in (3, 0, 2, 1, 4)]
    df = spark.createDataFrame(rows, "ent int, t int, x double, tag string")
    out = ewma(df, "x", ["ent"], ["t"], 0.5, chunk_rows=2)
    assert set(out.columns) == {"ent", "t", "x", "tag", "ewma"}
    got = {r.t: r.ewma for r in out.collect()}
    assert got[4] == pytest.approx(_sequential([0.0, 1.0, 2.0, 3.0, 4.0], 0.5)[4])
