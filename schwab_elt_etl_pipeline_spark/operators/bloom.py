"""Broadcastable bloom filters as plain columns — explicit shuffle reduction.

``build_bloom`` folds a key set into one row holding a bit array (k xxhash64
probes over m bits); ``bloom_member`` is the pure-expression membership test
a probe side applies after cross-joining that single broadcast row. Bloom
guarantees no false negatives, so `prefilter → exact confirm join` always
equals the plain join — the catalog's ``j_bloom_semi_join`` pins exactly
that equivalence against a DuckDB oracle, and the no-false-negative
invariant is asserted directly in tests/test_skew.py.

At 100 TB: the filter is O(m) bytes (2 KiB default) regardless of build-side
cardinality beyond its capacity planning, and it cuts ~(1-selectivity) of
the probe side's shuffle volume before the join — the explicit, composable
form of what Spark's runtime row-group bloom does inside a scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16_384
DEFAULT_SEEDS = (1, 2, 3)


def _bit_positions(key: Column, seed: int, bits: int) -> Column:
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(bits))


def build_bloom(
    keys_df: DataFrame,
    key_col: str,
    bits: int = DEFAULT_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> DataFrame:
    """ONE-row DataFrame: column ``arr`` = the bit array as array<long>."""
    # ceil, NOT floor: with a non-multiple-of-64 ``bits`` a floored word
    # count would leave the top positions unstorable — bloom_member would
    # probe past the array (ANSI: crash; non-ANSI: NULL → silent FALSE
    # NEGATIVES, breaking the filter's core guarantee)
    words = (bits + 63) // 64
    pos = keys_df.select(
        F.explode(
            F.array(*[_bit_positions(F.col(key_col), s, bits) for s in seeds])
        ).alias("pos")
    )
    one = F.lit(1).cast("long")
    per_word = pos.select(
        (F.col("pos") / 64).cast("int").alias("word"),
        F.call_function(
            "shiftleft", one, (F.col("pos") % 64).cast("int")
        ).alias("bit"),
    ).groupBy("word").agg(F.expr("bit_or(bit)").alias("bits"))
    return per_word.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(words - 1)),
            lambda w: F.coalesce(
                F.element_at(F.col("m"), w), F.lit(0).cast("long")
            ),
        ).alias("arr")
    )


def bloom_member(
    key: Column,
    arr: Column,
    bits: int = DEFAULT_BITS,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
) -> Column:
    """Membership predicate over the broadcast ``arr`` column: true for
    every inserted key (never a false negative), true with probability
    ≈ (1-e^{-kn/m})^k for others."""
    member = None
    for s in seeds:
        pos = _bit_positions(key, s, bits)
        word = (pos / 64).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        test = F.element_at(arr, word + 1).bitwiseAND(bit) != 0
        member = test if member is None else (member & test)
    return member
