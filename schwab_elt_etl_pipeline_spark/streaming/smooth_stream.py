"""Streaming twin of the linear-recurrence scan: per-key state smoothing.

Batch side, ``operators/recurrence.py`` (and the scalar
``operators/smooth.py``) solve ``y_t = A @ y_(t-1) + B @ x_t`` with a
chunked matrix-power window scan.  Streaming, the recurrence is the
textbook case for arbitrary stateful processing: the whole history
collapses into one n-vector of state per key, carried across micro-batches
by ``applyInPandasWithState`` (state store, checkpoint-recoverable, scales
with key cardinality — the same machinery as the reference's watchdog
threads, services/schwab_stream.py:96-140, re-expressed in
``streaming/stateful.py``).

Contract (mirrors the incremental-index family in ``streaming/corpus.py``):
rows must arrive per key in nondecreasing ``order`` across micro-batches —
the file/kafka replay and the reference's tick feeds satisfy this.  Within
a batch rows are sorted by ``order``; across batches the recurrence simply
continues from the stored state, so a stream fed time-ordered batches is
row-for-row identical to the batch operator (pinned by
tests/test_streaming_smooth.py).  Out-of-order arrivals are processed in
arrival order — the recurrence of the sequence actually observed.

The pandas function is the sanctioned Python boundary for stateful
streaming; per batch it does O(rows * n * (n+m)) flops on a small numpy
matrix — the per-key loop touches only that key's batch rows, never the
stream.  Null inputs contribute ``B @ 0`` (the state still decays), the
same missing-observation semantics as the batch operators.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, StructField, StructType


def recurrence_stream(
    stream: DataFrame,
    inputs: Sequence[str],
    keys: Sequence[str],
    order: Sequence[str],
    A: Sequence[Sequence[float]],
    B: Sequence[Sequence[float]],
    init: Sequence[Sequence[float]] | None = None,
    outs: Sequence[str] | None = None,
) -> DataFrame:
    """Append per-key recurrence state columns ``outs`` to a stream.

    Same semantics as :func:`operators.recurrence.linear_recurrence`
    (``y_1 = init @ x_1``, ``init`` defaults to ``B``), evaluated
    incrementally: one state vector per key in the state store.
    """
    An = np.asarray(A, dtype=float)
    Bn = np.asarray(B, dtype=float)
    if An.ndim != 2 or An.shape[0] != An.shape[1]:
        raise ValueError(f"A must be square, got {An.shape}")
    n = An.shape[0]
    if Bn.shape != (n, len(inputs)):
        raise ValueError(f"B must be {n}x{len(inputs)}, got {Bn.shape}")
    In = Bn if init is None else np.asarray(init, dtype=float)
    if In.shape != Bn.shape:
        raise ValueError(f"init must match B's shape, got {In.shape}")
    names = list(outs) if outs is not None else [f"y{r}" for r in range(n)]
    if len(names) != n:
        raise ValueError(f"need {n} output names, got {len(names)}")
    in_cols = list(inputs)
    order_cols = list(order)

    out_schema = StructType(
        list(stream.schema.fields)
        + [StructField(nm, DoubleType()) for nm in names]
    )
    state_schema = "seen long, " + ", ".join(f"s{r} double" for r in range(n))
    passthrough = [f.name for f in stream.schema.fields]

    def step(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            seen, y = int(st[0]), np.array(st[1:], dtype=float)
        else:
            seen, y = 0, np.zeros(n)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            x_mat = (
                pdf[in_cols].astype(float).fillna(0.0).to_numpy()
            )  # null observation -> B @ 0, state still decays
            out = np.empty((len(pdf), n))
            for i in range(len(pdf)):
                y = (In @ x_mat[i]) if seen == 0 else (An @ y + Bn @ x_mat[i])
                seen += 1
                out[i] = y
            res = pdf[passthrough].copy()
            for r, nm in enumerate(names):
                res[nm] = out[:, r]
            yield res
        state.update((seen, *[float(v) for v in y]))

    return stream.groupBy(*keys).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream(
    stream: DataFrame,
    value: str,
    keys: Sequence[str],
    order: Sequence[str],
    target: float,
    out: str = "cusum",
) -> DataFrame:
    """Upper CUSUM ``S_t = max(0, S_(t-1) + (x_t - target))`` per key.

    The clamp makes this recurrence nonlinear, so it is NOT a
    :func:`recurrence_stream` instance — but it is still one scalar of
    state per key.  Batch side the engine computes the same quantity
    without recursion via the prefix identity ``S_t = P_t - min(0, min
    P_i)`` (catalog ``w_cusum_shift``); the stream≡batch parity test
    cross-certifies the identity against the textbook sequential form.
    A null observation leaves the state untouched (its ``z`` is unknown,
    matching the batch side where a null contributes nothing to either
    the prefix sum or the prefix min).
    """
    out_schema = StructType(
        list(stream.schema.fields) + [StructField(out, DoubleType())]
    )
    passthrough = [f.name for f in stream.schema.fields]
    order_cols = list(order)

    def step(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        s = float(state.get[0]) if state.exists else 0.0
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(order_cols, kind="mergesort")
            xs = pdf[value].to_numpy(dtype=float)
            vals = np.empty(len(pdf))
            for i, x in enumerate(xs):
                if not np.isnan(x):
                    s = max(0.0, s + (x - target))
                vals[i] = s
            res = pdf[passthrough].copy()
            res[out] = vals
            yield res
        state.update((s,))

    return stream.groupBy(*keys).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType="s double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stream(
    stream: DataFrame,
    value: str,
    keys: Sequence[str],
    order: Sequence[str],
    alpha: float,
    out: str = "ewma",
) -> DataFrame:
    """Scalar streaming EWMA — the 1-state recurrence, seeded ``y_1 = x_1``
    (the same contract as :func:`operators.smooth.ewma`)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    return recurrence_stream(
        stream,
        [value],
        keys,
        order,
        A=[[1.0 - alpha]],
        B=[[alpha]],
        init=[[1.0]],
        outs=[out],
    )
