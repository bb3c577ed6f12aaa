"""Generalized linear-recurrence scan: ``y_t = A @ y_(t-1) + B @ x_t``.

``operators/smooth.py`` solves the scalar EWMA recurrence with a
chunked-exponent window scan.  This operator is the vector/matrix
generalization: an n-dimensional state driven by an m-dimensional input,
with constant transition matrix ``A`` — the family that covers Holt double
exponential smoothing (level + trend), RiskMetrics EW volatility
(EWMA of x and x**2 jointly), low-order IIR/AR filters, and debounce
chains.  The reference smooths mark series with frame-bounded moving
averages (docs/sql_server.md:484-502); recursive filters are the sibling
every quant stack keeps next to those frames, and SQL window functions
cannot express them directly.

The construction is the matrix form of the smooth.py factorization
(a work-efficient Blelloch scan over chunk summaries), with one new trick:
because ``A`` is constant and the chunk length is bounded, every matrix
power the plan needs — ``A^j`` and ``A^(-j)`` for ``j`` within a chunk —
is precomputed on the driver with numpy and embedded as a kilobyte-scale
literal lookup array.  The executors never multiply matrices; each row does
O(n*(n+m)) multiply-adds against ``element_at`` lookups, all inside native
expressions (no UDF, no driver loop):

1. rows rank within their entity (one hash shuffle on the partition keys);
2. each entity splits into fixed-size chunks, sized so the condition number
   ``||A^j||*||A^(-j)||`` of the within-chunk factorization stays small
   (skewed eigenvalues shrink the chunk automatically — correctness is
   preserved, there are just more summaries);
3. within a chunk, the zero-state response is the closed form
   ``y_j = A^j * SUM_i A^(-i) (B x_i)`` — a running window sum of n
   components, then an n x n recombine;
4. chunk summaries (end state vector + ``A^rows``) fold left-to-right per
   entity with ``F.aggregate`` — the affine composition
   ``carry_c = end_c + A^rows_c @ carry_(c-1)`` — emitting each chunk's
   incoming carry; summaries are O(rows/chunk) per entity;
5. the final state recombines: ``y = local + A^(j+1) @ carry_in``.

Scale shape: identical to smooth.py — one data shuffle on the entity keys +
one window sort; the summary fold and join-back move per-chunk state
vectors (n doubles), never data rows.  The lookup literals are
``chunk * n * n`` doubles — kilobytes, serialized once into the plan.

``A`` must be invertible for chunks > 1 (the within-chunk factorization
divides by it); a singular ``A`` degrades to ``chunk_rows=1``, where the
fold does all the work and no inverse is needed.

Null inputs are "missing observations": they contribute ``B @ 0`` (state
still decays through ``A``) — gap-fill first for carry-forward semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.operators.pinning import pin_shared

_RN = "__lr_rn"
_CHUNK = "__lr_chunk"
_J = "__lr_j"
_LOCAL = "__lr_local"
_CARRY = "__lr_carry_in"

#: Hard cap on chunk length — bounds the embedded lookup literals to
#: ``128 * n * n`` doubles and keeps codegen expression trees small.
_MAX_CHUNK = 128
#: Condition budget for the within-chunk factorization: lose at most ~9 of
#: the 16 double digits to ``A^j @ A^(-i)`` cancellation.
_MAX_COND = 1e9
#: Magnitude rails — no embedded literal may approach double overflow.
_MAX_MAG = 1e150


def _powers(A: np.ndarray, cap: int) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """(A^0..A^b, A^0..A^-(b-1)) with b auto-bounded by conditioning."""
    n = A.shape[0]
    pows = [np.eye(n)]
    invs = [np.eye(n)]
    try:
        Ainv = np.linalg.inv(A)
    except np.linalg.LinAlgError:
        return [np.eye(n), A.copy()], [np.eye(n)]  # singular: chunk_rows=1
    if not np.all(np.isfinite(Ainv)):
        return [np.eye(n), A.copy()], [np.eye(n)]
    while len(invs) < cap:
        p = pows[-1] @ A
        v = invs[-1] @ Ainv
        mp, mv = np.abs(p).max(), np.abs(v).max()
        if not (np.isfinite(mp) and np.isfinite(mv)):
            break
        if mp * mv > _MAX_COND or mv > _MAX_MAG or (mp < 1.0 / _MAX_MAG):
            break
        pows.append(p)
        invs.append(v)
    pows.append(pows[-1] @ A)  # A^b, for the carry recombine at j = b-1
    return pows, invs


def _mat_lit(mats: Sequence[np.ndarray]):
    """array< array<double> > literal: mats[j] flattened row-major."""
    return F.array(
        *[
            F.array(*[F.lit(float(v)) for v in m.reshape(-1)])
            for m in mats
        ]
    )


def _matvec(mat_col, vec_cols: Sequence, n: int, m: int):
    """[mat @ vec] as n expression columns; mat_col is a flat n*m array."""
    return [
        sum(
            (F.element_at(mat_col, r * m + c + 1) * vec_cols[c] for c in range(m)),
            start=F.lit(0.0),
        )
        for r in range(n)
    ]


def linear_recurrence(
    df: DataFrame,
    inputs: Sequence[str],
    partition: Sequence[str],
    order: Sequence[str],
    A: Sequence[Sequence[float]],
    B: Sequence[Sequence[float]],
    init: Sequence[Sequence[float]] | None = None,
    outs: Sequence[str] | None = None,
    chunk_rows: int | None = None,
) -> DataFrame:
    """Append per-entity state columns ``outs`` solving
    ``y_1 = init @ x_1; y_t = A @ y_(t-1) + B @ x_t`` in ``order``.

    ``A`` is n x n, ``B`` and ``init`` are n x m (``init`` defaults to
    ``B``), ``inputs`` names the m input columns, ``outs`` the n state
    outputs (default ``y0..y(n-1)``).  ``order`` must totally order rows
    within an entity.  ``chunk_rows`` is exposed for tests; the default is
    bounded by the conditioning of ``A``'s powers.
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
    m = len(inputs)
    names = list(outs) if outs is not None else [f"y{r}" for r in range(n)]
    if len(names) != n:
        raise ValueError(f"need {n} output names, got {len(names)}")
    part = list(partition)

    pows, invs = _powers(An, _MAX_CHUNK)
    b = min(chunk_rows or len(invs), len(invs), _MAX_CHUNK)
    b = max(b, 1)
    apow = _mat_lit(pows[: b + 1])  # A^0 .. A^b
    ainv = _mat_lit(invs[:b])  # A^0 .. A^-(b-1)

    w_rank = Window.partitionBy(*part).orderBy(*order)
    ranked = (
        df.withColumn(_RN, F.row_number().over(w_rank) - F.lit(1))
        .withColumn(_CHUNK, (F.col(_RN) / b).cast("long"))
        .withColumn(_J, F.col(_RN) % b)
    )

    # Per-row drive vector: init @ x at the entity head, else B @ x; null
    # inputs contribute zero but the step still decays the state.
    xs = [F.coalesce(F.col(c).cast("double"), F.lit(0.0)) for c in inputs]
    bx = [
        F.when(
            F.col(_RN) == 0,
            sum((F.lit(In[r, c]) * xs[c] for c in range(m)), start=F.lit(0.0)),
        ).otherwise(
            sum((F.lit(Bn[r, c]) * xs[c] for c in range(m)), start=F.lit(0.0))
        )
        for r in range(n)
    ]

    # Within-chunk zero-state response: u_i = A^(-i) @ bx_i, running-sum its
    # n components, then recombine with A^j.
    inv_j = F.element_at(ainv, (F.col(_J) + 1).cast("int"))
    u = _matvec(inv_j, bx, n, n)
    w_chunk = (
        Window.partitionBy(*part, _CHUNK)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = [F.sum(u[r]).over(w_chunk) for r in range(n)]
    pow_j = F.element_at(apow, (F.col(_J) + 1).cast("int"))
    # the ranked+local subtree (exchange + sort + two windows over the full
    # data) feeds BOTH the per-row output and the chunk summaries; pin it so
    # the data-side work runs once (r13 back-to-back A/B: 2.00 -> 1.40 s).
    # FULL-DATA pin — conf-gated: see operators/pinning.py for the storage/
    # lineage trade and the opt-out contract for at-scale callers.
    ranked = pin_shared(ranked.withColumn(_LOCAL, F.array(*_matvec(pow_j, s, n, n))))

    # Chunk summaries -> per-entity affine fold (carry = end + A^cnt @ carry)
    # -> each chunk's incoming carry, emitted in chunk order.
    summaries = ranked.groupBy(*part, _CHUNK).agg(
        F.max_by(_LOCAL, _RN).alias("_end"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    zeros = F.array(*[F.lit(0.0) for _ in range(n)])
    folded = (
        summaries.withColumn("_a", F.element_at(apow, (F.col("_cnt") + 1).cast("int")))
        .groupBy(*part)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(_CHUNK, "_a", "_end"))),
                F.struct(
                    zeros.alias("carry"),
                    F.expr("CAST(array() AS array<array<double>>)").alias("offs"),
                ),
                lambda acc, st: F.struct(
                    F.array(
                        *[
                            F.element_at(st["_end"], r + 1)
                            + sum(
                                (
                                    F.element_at(st["_a"], r * n + c + 1)
                                    * F.element_at(acc["carry"], c + 1)
                                    for c in range(n)
                                ),
                                start=F.lit(0.0),
                            )
                            for r in range(n)
                        ]
                    ).alias("carry"),
                    F.concat(acc["offs"], F.array(acc["carry"])).alias("offs"),
                ),
                lambda acc: acc["offs"],
            ).alias("_offs")
        )
        .select(*part, F.posexplode("_offs").alias(_CHUNK, _CARRY))
    )

    joined = ranked.join(folded, on=[*part, _CHUNK], how="left")
    pow_j1 = F.element_at(apow, (F.col(_J) + 2).cast("int"))
    carry = [
        F.coalesce(F.element_at(F.col(_CARRY), r + 1), F.lit(0.0))
        for r in range(n)
    ]
    recomb = _matvec(pow_j1, carry, n, n)
    out = joined.select(
        *df.columns,
        *[
            (F.element_at(F.col(_LOCAL), r + 1) + recomb[r]).alias(names[r])
            for r in range(n)
        ],
    )
    return out
