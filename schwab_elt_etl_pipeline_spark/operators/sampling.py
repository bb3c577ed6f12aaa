"""Deterministic sampling for corpus mixing.

Training-data pipelines mix sources at prescribed rates ("10 % of web, 50 %
of books"). ``df.sampleBy`` draws per-row randoms — irreproducible across
runs/engines and un-auditable. Hash-mod sampling makes the decision a pure
function of the row KEY: reruns, backfills, and a differential oracle all
agree on exactly which rows are in.

The key is reduced mod a prime before the multiply so the arithmetic stays
in int64 at any key range (100 TB-safe), same recipe as the catalog's
``sample_hash_mod``.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PRIME = 1_000_003
_MIX = 2_654_435_761  # Knuth multiplicative hash constant
_PRIME2 = 999_983  # second reduction prime — breaks mod-`buckets` stripe phase
# Salt picks a distinct multiplier. The step's residue mod _PRIME2 must be
# LARGE: the per-key difference between salt s and salt 0 is
# s·step·key (mod _PRIME2), so a step ≡ tiny value — the original 999_979
# ≡ −4 — perturbs small keys by only a few thousand and two salts' draws
# come out ~identical instead of near-independent (caught by
# test_text_retrieval::test_salted_draws_are_near_independent).
# 611_957 is its own (large) residue, and the int64 bound still holds:
# max mult ≈ 2.65e9 + 9e6·611957 ≈ 5.5e12, times a key < 1e6 < 2^63.
_SALT_STEP = 611_957


def hash_bucket(key: Column | str, buckets: int = 1000, salt: int = 0) -> Column:
    """Deterministic bucket in [0, buckets) from an integer key column.

    ``pmod`` (not ``%``) at every reduction: Spark's ``%`` preserves the
    dividend's sign, so a negative key — e.g. an xxhash64 surrogate — would
    get a negative bucket and pass every ``bucket < threshold`` filter,
    silently over-sampling those rows.

    The salt selects a DIFFERENT MULTIPLIER (``_MIX + salt * _SALT_STEP``)
    rather than an additive offset: adding the salt after the multiply only
    rotates bucket ids, so two salts' samples would overlap almost entirely —
    a "fresh" holdout drawn with a new salt would be nearly the same rows.
    Distinct multipliers mod the reduction prime give near-independent
    bucketings (overlap of two p-fraction samples ≈ p²).

    The arithmetic stays in int64 for any key range: the key is reduced mod
    ``_PRIME`` (≈1e6) before the multiply, and the multiplier is bounded by
    the salt cap, so the product is < 2^63 even at 100 TB-scale keys.
    """
    if not 0 <= salt < 9_000_000:
        raise ValueError("salt must be in [0, 9e6) to keep the product in int64")
    mult = _MIX + salt * _SALT_STEP
    if mult % _PRIME2 == 0:  # degenerate multiplier: every bucket would be 0
        mult += _SALT_STEP
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.pmod(F.pmod(k, F.lit(_PRIME)) * F.lit(mult), F.lit(_PRIME2)), F.lit(buckets)
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` share of each stratum.

    Fractions are resolved to a per-mill threshold (granularity 1/1000).
    Rows in strata absent from ``fractions`` keep ``default_fraction``.
    """
    expr = F.lit(int(round(default_fraction * 1000)))
    for stratum, frac in fractions.items():
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * 1000)))
        ).otherwise(expr)
    return df.filter(hash_bucket(key, 1000, salt) < expr)


def hash_rank_key(key: Column | str, salt: int = 0) -> Column:
    """The pre-bucket hash value in [0, _PRIME2): a deterministic
    pseudo-random TOTAL ordering key (same arithmetic as hash_bucket minus
    the final bucket reduction), usable for exact-k sampling. Collisions
    (≈ n/1e6 per stratum) need a unique tiebreaker alongside it."""
    if not 0 <= salt < 9_000_000:
        raise ValueError("salt must be in [0, 9e6) to keep the product in int64")
    mult = _MIX + salt * _SALT_STEP
    if mult % _PRIME2 == 0:
        mult += _SALT_STEP
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(k, F.lit(_PRIME)) * F.lit(mult), F.lit(_PRIME2))


def exact_k_per_group(
    df: DataFrame,
    key: str,
    strata_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic EXACT-k sample per stratum: rank rows by the hash
    ordering key (ties broken by the row key) and keep the first ``k``.

    The fixed-size complement to ``stratified_hash_sample``'s fixed-rate
    draw — eval subsets and per-source quotas need "exactly k docs per
    source", which a rate can only approximate. Scale shape: one window
    per stratum (hash-partitioned, map-side top-k via rank pushdown —
    Spark rewrites rank-filter windows to a per-partition top-k heap);
    different salts give near-independent draws, same argument as
    hash_bucket. Adds a ``sample_rank`` column (1..k)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_rank_key(key, salt).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
