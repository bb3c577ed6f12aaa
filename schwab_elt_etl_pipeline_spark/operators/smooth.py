"""Exponentially-weighted moving average (EWMA) as a native window scan.

The reference's Gold layer smooths mark series with frame-bounded moving
averages (docs/sql_server.md:484-502 — the W1-W3 family in
``operators/windows.py``). The EWMA ``y_t = (1-a)*y_(t-1) + a*x_t`` is the
recursive sibling every quant stack keeps next to those frames (half-life
smoothing of option marks, EWMA volatility), but SQL window functions cannot
express a recurrence directly and the naive closed form

    y_t = (1-a)^(t-1)*x_1 + a * SUM_i (1-a)^(t-i) * x_i

overflows ``POWER(1-a, -i)`` once a series is a few hundred rows deep.

This operator computes the exact recurrence with native expressions only —
no Python UDF, no driver loop — by bounding every exponent:

1. rows rank within their entity (one hash shuffle on the partition keys —
   the same exchange the W1-W3 trio rides);
2. each entity's series splits into fixed-size CHUNKS sized so that
   ``(1-a)^(-chunk)`` stays far inside double range;
3. a within-chunk prefix sum (window over entity+chunk, same sort) evaluates
   the closed form locally — the zero-state chunk response;
4. chunk summaries (per-chunk decay ``A = (1-a)^rows`` and end-state) fold
   left-to-right per entity with ``F.aggregate`` — the affine composition
   ``carry_c = end_c + A_c * carry_(c-1)`` — emitting each chunk's incoming
   carry; summaries are O(rows / chunk) per entity, kilobytes;
5. the final value recombines: ``y = local + (1-a)^(j+1) * carry_in``.

Scale shape: one data shuffle on the entity keys + one window sort, plus a
summary-side join whose left key set is (entity, chunk) — the data exchange
is the unavoidable one any per-entity window pays; everything else moves
per-chunk scalars. Long single entities stay numerically exact because no
exponent ever exceeds the chunk bound (the same reason the distributed
prefix scan in ``operators/prefix.py`` never materializes a global window).

Null ``value`` rows are "missing observations": they contribute nothing but
their step still decays the state — gap-fill first (``operators/gapfill.py``)
if carry-forward semantics are wanted.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.operators.pinning import pin_shared

_RN = "__ewma_rn"
_CHUNK = "__ewma_chunk"
_J = "__ewma_j"
_LOCAL = "__ewma_local"
_CARRY = "__ewma_carry_in"

#: Exponent budget: |ln((1-a)^-j)| <= 600 keeps every intermediate below
#: ~1e260 even after multiplying data-scale values in — far from overflow.
_MAX_EXP = 600.0
_MAX_CHUNK = 512


def _chunk_rows(alpha: float) -> int:
    """Largest chunk length whose within-chunk exponent stays bounded."""
    decay = 1.0 - alpha
    if decay <= 0.0:
        return 1
    return max(1, min(_MAX_CHUNK, int(_MAX_EXP / -math.log(decay))))


def ewma(
    df: DataFrame,
    value: str,
    partition: Sequence[str],
    order: Sequence[str],
    alpha: float,
    out: str = "ewma",
    chunk_rows: int | None = None,
) -> DataFrame:
    """Append ``out`` = EWMA of ``value`` per entity, exact recurrence
    ``y_1 = x_1; y_t = (1-alpha)*y_(t-1) + alpha*x_t``.

    ``order`` must be a total order within an entity (include a unique
    tiebreaker); ``chunk_rows`` is exposed for tests (forcing multi-chunk
    folds on tiny fixtures) — the default is numerically safe for any alpha.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    part = list(partition)
    if alpha == 1.0:  # degenerate: no memory
        return df.withColumn(out, F.col(value).cast("double"))
    decay = 1.0 - alpha
    # Clamp caller overrides to the numeric-safety bound: pow(decay, -j) for
    # j up to the chunk size must stay finite, so an oversized chunk_rows
    # would silently turn the fold into inf/NaN (linear_recurrence clamps
    # its override the same way).
    safe = _chunk_rows(alpha)
    b = min(chunk_rows, safe) if chunk_rows else safe

    w_rank = Window.partitionBy(*part).orderBy(*order)
    ranked = df.withColumn(_RN, F.row_number().over(w_rank) - F.lit(1))
    ranked = ranked.withColumn(_CHUNK, (F.col(_RN) / b).cast("long")).withColumn(
        _J, F.col(_RN) % b
    )

    # Within-chunk zero-state response. b_i = alpha*x (entity head: plain x —
    # the y_1 = x_1 seed); exponents range over [0, chunk) only.
    b_i = F.when(F.col(_RN) == 0, F.col(value).cast("double")).otherwise(
        F.lit(alpha) * F.col(value).cast("double")
    )
    w_chunk = (
        Window.partitionBy(*part, _CHUNK)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = F.pow(F.lit(decay), F.col(_J)) * F.sum(
        b_i * F.pow(F.lit(decay), -F.col(_J))
    ).over(w_chunk)
    # the ranked+local subtree (exchange + sort + two windows over the full
    # data) feeds BOTH the per-row output and the chunk summaries; pin it so
    # the data-side work runs once (r13 A/B on the matrix twin: -30%).
    # FULL-DATA pin — conf-gated: see operators/pinning.py for the storage/
    # lineage trade and the opt-out contract for at-scale callers.
    ranked = pin_shared(ranked.withColumn(_LOCAL, local))

    # Chunk summaries -> per-entity affine fold -> each chunk's incoming
    # carry. A chunk missing observations entirely still decays: A counts
    # rows, not non-null values.
    summaries = ranked.groupBy(*part, _CHUNK).agg(
        F.max_by(_LOCAL, _RN).alias("_end"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    folded = (
        summaries.withColumn(
            "_a",
            F.when(F.col(_CHUNK) == 0, F.lit(0.0)).otherwise(
                F.pow(F.lit(decay), F.col("_cnt"))
            ),
        )
        .groupBy(*part)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct(_CHUNK, "_a", "_end"))),
                F.struct(
                    F.lit(0.0).cast("double").alias("carry"),
                    F.expr("CAST(array() AS array<double>)").alias("offs"),
                ),
                lambda acc, s: F.struct(
                    (
                        F.coalesce(s["_end"], F.lit(0.0))
                        + s["_a"] * acc["carry"]
                    ).alias("carry"),
                    F.concat(acc["offs"], F.array(acc["carry"])).alias("offs"),
                ),
                lambda acc: acc["offs"],
            ).alias("_offs")
        )
        .select(*part, F.posexplode("_offs").alias(_CHUNK, _CARRY))
    )

    joined = ranked.join(folded, on=[*part, _CHUNK], how="left")
    # A row whose chunk-prefix is all-null has a NULL local term; treat it as
    # 0 so the incoming carry still decays through (missing observations do
    # not erase state).
    y = F.coalesce(F.col(_LOCAL), F.lit(0.0)) + F.pow(
        F.lit(decay), F.col(_J) + 1
    ) * F.coalesce(F.col(_CARRY), F.lit(0.0))
    return joined.withColumn(out, y).drop(_RN, _CHUNK, _J, _LOCAL, _CARRY)
