"""Deterministic training-shard assignment + balance manifest.

The write side of a training-data pipeline: documents are assigned to a
fixed number of output shards by a deterministic integer hash so that (a)
any worker can recompute the assignment without coordination, (b) reruns
are idempotent, and (c) shards come out statistically balanced in both doc
count and token mass. The manifest — per-shard doc/token totals plus exact
parts-per-million shares — is what a trainer's data loader consumes and
what an SRE reads to spot imbalance before a 1000-GPU job does.

Spark-first shape: the hash is pure bigint arithmetic (Knuth multiplicative
step, engine-exact — NOT Spark's ``hash()``, which DuckDB can't replay), so
the whole operator is one map + one ``shards``-key groupBy + a 1-row
broadcast total. Nothing here scales with anything but the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth's 2^32 / phi multiplier; the masked product is a full-period mix
# of the low 32 id bits — deterministic and exactly replayable in ANSI SQL
_KNUTH = 2654435761
_MASK32 = (1 << 32) - 1


def shard_of(id_col: Column | str, shards: int) -> Column:
    """Deterministic shard id in [0, shards) from a NON-NEGATIVE integral
    id column. The multiply runs in DECIMAL(38,0) (the DSIR/DoReMi exact-
    integer discipline) because id * multiplier overflows ANSI bigint for
    ids past ~3.5e9 — decimal keeps it exact at any id, and the mod-2^32
    fold is the Knuth mix."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        (c.cast("decimal(38,0)") * F.lit(_KNUTH)) % F.lit(_MASK32 + 1) % shards
    ).cast("int")


def shard_of_sql(id_expr: str, shards: int) -> str:
    """The DuckDB-replayable twin of :func:`shard_of` (bit-identical;
    HUGEINT is DuckDB's decimal-exact wide integer)."""
    return (
        f"CAST((CAST({id_expr} AS HUGEINT) * {_KNUTH}) % {_MASK32 + 1}"
        f" % {shards} AS BIGINT)"
    )


def keep_ppm(
    id_col: Column | str, rate_ppm: Column | int, salt: int = 0
) -> Column:
    """Deterministic parts-per-million Bernoulli keep decision: keep a row
    iff ``knuth_mix(id + salt) mod 1e6 < rate_ppm``. The mixture-APPLY
    primitive (DoReMi et al. compute per-source weights; this enforces
    them): coordination-free, idempotent on reruns, and exact in
    expectation — the hash is uniform over [0, 1e6), so a 250000-ppm rate
    keeps 25% with zero RNG state. ``salt`` decorrelates independent
    sampling decisions from each other AND from :func:`shard_of` (same
    mix, different lattice point)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    r = F.lit(rate_ppm) if isinstance(rate_ppm, int) else rate_ppm
    return (
        ((c + F.lit(salt)).cast("decimal(38,0)") * F.lit(_KNUTH))
        % F.lit(_MASK32 + 1)
        % 1_000_000
    ) < r.cast("decimal(38,0)")


def keep_ppm_sql(id_expr: str, rate_ppm_expr: str, salt: int = 0) -> str:
    """DuckDB-replayable twin of :func:`keep_ppm` (bit-identical)."""
    return (
        f"((CAST({id_expr} AS HUGEINT) + {salt}) * {_KNUTH})"
        f" % {_MASK32 + 1} % 1000000 < {rate_ppm_expr}"
    )


def token_count(text_col: Column | str) -> Column:
    """Whitespace-token count with the empty-text guard (blank counts 0 —
    an unguarded split of '' yields [''] = 1 in BOTH engines). THE token
    rule for the manifest, shared by the batch operator and the streaming
    ledger (`streaming/shard_stream.py`) so the two can't drift."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return (
        F.when(F.length(F.trim(c)) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(c), r"\s+")))
        .cast("long")
    )


def manifest_shares(per: DataFrame) -> DataFrame:
    """Attach exact integer ppm shares to a per-shard totals table
    (shard, n_docs, sum_tokens, min_doc, max_doc) — the unpartitioned
    window runs over at most ``shards`` aggregated rows, never the data.
    Shared by the batch manifest and the streaming ledger's serve path."""
    return per.select(
        "shard",
        "n_docs",
        "sum_tokens",
        "min_doc",
        "max_doc",
        # counters go through DECIMAL(38,0) before the *1e6 — a bigint
        # multiply silently wraps past ~9.2e12 docs/tokens per shard,
        # which the 100 TB framing can actually reach; decimal keeps the
        # ppm shares exact at any corpus size (div folds back to bigint)
        F.expr(
            "(cast(n_docs as decimal(38,0)) * 1000000) div "
            "greatest(sum(n_docs) over "
            "(rows between unbounded preceding and unbounded following), 1)"
        ).alias("docs_share_ppm"),
        F.expr(
            "(cast(sum_tokens as decimal(38,0)) * 1000000) div "
            "greatest(sum(sum_tokens) over "
            "(rows between unbounded preceding and unbounded following), 1)"
        ).alias("tokens_share_ppm"),
    )


def shard_manifest(
    docs: DataFrame,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard manifest: (shard, n_docs, sum_tokens, min_doc, max_doc,
    docs_share_ppm, tokens_share_ppm).

    Tokens are whitespace-token counts (the corpus-stats rule; empty text
    counts 0 — guarded identically in the oracle, where an empty split
    would otherwise yield ['']). Shares are integer parts-per-million via
    ``div`` against 1-row broadcast totals, so the manifest hashes
    identically across engines — no float division anywhere.
    """
    per = (
        docs.select(
            shard_of(id_col, shards).alias("shard"),
            F.col(id_col).alias("_id"),
            token_count(text_col).alias("_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("sum_tokens"),
            F.min("_id").alias("min_doc"),
            F.max("_id").alias("max_doc"),
        )
    )
    # ONE corpus scan: totals come from an unpartitioned window over the
    # ALREADY-AGGREGATED manifest — at most ``shards`` rows, so the
    # SinglePartition exchange is bounded by the shard count, never the
    # corpus (a crossJoin against a separate agg would scan the data twice)
    return manifest_shares(per)
