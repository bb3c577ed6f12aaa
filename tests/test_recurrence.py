"""Unit tests for the generalized linear-recurrence scan
(operators/recurrence.py).

Ground truth is the sequential recurrence ``y_1 = init @ x_1;
y_t = A @ y_(t-1) + B @ x_t`` run driver-side with numpy.  The operator
must reproduce it through chunked matrix-power windows + the affine carry
fold for diagonal A (EWMA stack), full-matrix A with complex eigenvalues
(Holt), skewed eigenvalues (auto-shrunk chunks), and singular A
(chunk=1 degraded mode).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from schwab_elt_etl_pipeline_spark.operators.recurrence import (
    _powers,
    linear_recurrence,
)

HOLT = {  # alpha=0.4, beta=0.3 Holt level/trend matrices
    "A": [[0.6, 0.6], [-0.12, 0.88]],
    "B": [[0.4], [0.12]],
    "init": [[1.0], [0.0]],
}


def _sequential(xs, A, B, init):
    A, B, init = map(np.asarray, (A, B, init))
    out, y = [], None
    for x in xs:
        v = np.array([0.0 if c is None else float(c) for c in x])
        y = init @ v if y is None else A @ y + B @ v
        out.append(y.copy())
    return out


def _series(n, ent=0, m=1):
    return [
        (ent, i, *[math.sin(i * 0.7 + k) * 100 + (i * 37 % 11) for k in range(m)])
        for i in range(n)
    ]


def _check(spark, rows, A, B, init=None, m=1, chunk_rows=None, rel=1e-8):
    cols = ", ".join(f"x{k} double" for k in range(m))
    df = spark.createDataFrame(rows, f"ent int, t int, {cols}")
    n = len(A)
    got = linear_recurrence(
        df,
        [f"x{k}" for k in range(m)],
        ["ent"],
        ["t"],
        A,
        B,
        init=init,
        outs=[f"s{r}" for r in range(n)],
        chunk_rows=chunk_rows,
    ).collect()
    by_ent = {}
    for row in sorted(rows):
        by_ent.setdefault(row[0], []).append(row[2:])
    refs = {
        e: _sequential(xs, A, B, B if init is None else init)
        for e, xs in by_ent.items()
    }
    assert len(got) == len(rows)
    for r in got:
        want = refs[r.ent][r.t]
        for k in range(n):
            assert getattr(r, f"s{k}") == pytest.approx(
                want[k], rel=rel, abs=1e-8
            ), f"ent={r.ent} t={r.t} state={k}"


def test_diagonal_matches_two_independent_ewmas(spark):
    # EW mean + EW mean-of-squares jointly (the EW volatility stack).
    rows = [(e, t, x, x * x) for (e, t, x) in _series(120, 0) + _series(45, 1)]
    _check(
        spark,
        rows,
        A=[[0.8, 0.0], [0.0, 0.8]],
        B=[[0.2, 0.0], [0.0, 0.2]],
        init=[[1.0, 0.0], [0.0, 1.0]],
        m=2,
        chunk_rows=16,
    )


@pytest.mark.parametrize("chunk_rows", [1, 3, 16, None])
def test_holt_level_trend(spark, chunk_rows):
    rows = _series(150, 0) + _series(37, 1) + [(2, 0, 42.0)]
    _check(spark, rows, chunk_rows=chunk_rows, **HOLT)


def test_long_series_default_chunking(spark):
    _check(spark, _series(3000), **HOLT)


def test_skewed_eigenvalues_shrink_chunk():
    # lambda = 0.9, 0.02: cond of the factorization grows 45x per step, so
    # the auto bound must stop well before the 128 cap.
    pows, invs = _powers(np.diag([0.9, 0.02]), 128)
    assert 1 < len(invs) < 16
    j = len(invs) - 1
    cond = np.abs(pows[j]).max() * np.abs(invs[j]).max()
    assert cond <= 1e9 * 45  # one step past budget at most


def test_skewed_eigenvalues_still_exact(spark):
    _check(
        spark,
        _series(200),
        A=[[0.9, 0.0], [0.0, 0.02]],
        B=[[1.0], [1.0]],
        rel=1e-6,
    )


def test_singular_A_degrades_to_chunk_one(spark):
    A = [[0.5, 0.5], [0.5, 0.5]]  # rank 1
    pows, invs = _powers(np.asarray(A), 128)
    assert len(invs) == 1
    _check(spark, _series(40), A=A, B=[[1.0], [0.0]])


def test_null_decays_without_update(spark):
    rows = [(0, 0, 10.0), (0, 1, None), (0, 2, 20.0)]
    df = spark.createDataFrame(rows, "ent int, t int, x double")
    got = {
        r.t: r.s0
        for r in linear_recurrence(
            df, ["x"], ["ent"], ["t"], [[0.5]], [[0.5]], init=[[1.0]],
            outs=["s0"], chunk_rows=2,
        ).collect()
    }
    assert got[0] == pytest.approx(10.0)
    assert got[1] == pytest.approx(5.0)  # decays through the gap
    assert got[2] == pytest.approx(12.5)


try:
    from hypothesis import given, settings, strategies as st

    _floats = st.one_of(
        st.none(),
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=64),
    )

    @settings(max_examples=8, deadline=None)
    @given(
        xs=st.lists(_floats, min_size=1, max_size=60),
        alpha=st.floats(min_value=0.05, max_value=0.95),
        chunk=st.integers(min_value=1, max_value=9),
    )
    def test_property_random_series_match_sequential(spark, xs, alpha, chunk):
        """Any series/alpha/chunking: the chunked scan equals the sequential
        recurrence (EWMA form y_1 = x_1, nulls decay without update)."""
        rows = [(0, t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "ent int, t int, x double")
        got = {
            r.t: r.s0
            for r in linear_recurrence(
                df, ["x"], ["ent"], ["t"],
                A=[[1.0 - alpha]], B=[[alpha]], init=[[1.0]],
                outs=["s0"], chunk_rows=chunk,
            ).collect()
        }
        want = _sequential(
            [(x,) for x in xs], [[1.0 - alpha]], [[alpha]], [[1.0]]
        )
        for t in range(len(xs)):
            assert got[t] == pytest.approx(want[t][0], rel=1e-9, abs=1e-9)

except ImportError:  # pragma: no cover - hypothesis is baked into the env
    pass


def test_shape_validation():
    with pytest.raises(ValueError):
        linear_recurrence(None, ["x"], ["e"], ["t"], [[1.0, 0.0]], [[1.0]])
    with pytest.raises(ValueError):
        linear_recurrence(None, ["x"], ["e"], ["t"], [[1.0]], [[1.0], [2.0]])
    with pytest.raises(ValueError):
        linear_recurrence(
            None, ["x"], ["e"], ["t"], [[1.0]], [[1.0]], outs=["a", "b"]
        )


def test_extra_columns_survive(spark):
    rows = [(0, t, float(t), f"tag{t}") for t in (3, 0, 2, 1)]
    df = spark.createDataFrame(rows, "ent int, t int, x double, tag string")
    out = linear_recurrence(
        df, ["x"], ["ent"], ["t"], [[0.5]], [[0.5]], outs=["s"], chunk_rows=2
    )
    assert set(out.columns) == {"ent", "t", "x", "tag", "s"}
