"""Skew handling: explicit salting primitives.

AQE's skew-join splitting (enabled in session.py) covers sort-merge joins at
runtime, but two cases still need explicit salting at 100 TB:

- **Skewed aggregation**: one hot group (one symbol, one user) lands on one
  reducer. ``salted_agg`` runs the classic two-phase pattern: partial
  aggregate on (key, salt), then final aggregate on key. Correct for any
  algebraic aggregate expressed as (partial_exprs, final_exprs).
- **Skewed broadcast-side lookup**: handled by `F.broadcast` already (no
  shuffle on the big side) — prefer that over salting when the dim fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``salt_buckets`` random salts.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` recombine partials
    per keys — e.g. SUM/SUM, COUNT/SUM, MAX/MAX, or (SUM, COUNT)/(SUM, SUM)
    for averages. The salt column is uniform random, so the hot key's rows
    spread over ``salt_buckets`` reducers in phase one.

    Example::

        salted_agg(df, ["sym"],
                   {"_s": F.sum("qty"), "_c": F.count(F.lit(1))},
                   {"total": F.sum("_s"), "n": F.sum("_c")})
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final_aggs.items()]
    )


def salted_join_skewed_left(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted shuffle join for a skewed LEFT side against a NON-broadcastable
    right side: left rows get a random salt; right rows replicate across all
    salt values; the join runs on (keys, salt). Replication factor =
    ``salt_buckets`` on the right — use only when the right side is too big
    to broadcast but much smaller than the skewed left."""
    salted_left = left.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    replicated_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_left.join(
        replicated_right, on=[*on, "_salt"], how=how
    ).drop("_salt")
