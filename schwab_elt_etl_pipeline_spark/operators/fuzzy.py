"""Blocked fuzzy matching (entity resolution) via edit distance.

All-pairs Levenshtein is O(n²) — never viable at scale. The standard shape:
**blocking** keys partition the corpus into small candidate groups (here:
caller-supplied expressions — length, prefixes, phonetic codes, simhash
bands…), candidate pairs come from an equi-self-join on the blocks, and the
edit-distance threshold is a residual filter evaluated JVM-side
(``levenshtein`` is a native Spark expression — no Python in the loop).

Recall is governed by the blocking choice, exactly like the LSH band choice
in ``operators/dedup.py``; a pair split across blocks is never compared.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_exprs: Sequence[Column | str],
    max_dist: int = 1,
) -> DataFrame:
    """Candidate pairs (a_id < b_id) whose ``text_col`` values are within
    ``max_dist`` edits, compared only inside identical blocking keys.

    Returns (a_id, b_id, a_text, b_text, dist). Pairs are emitted once even
    if multiple blocking expressions coincide (blocks form one composite
    key, not a union)."""
    blocks = [
        (F.expr(b) if isinstance(b, str) else b).alias(f"_blk{i}")
        for i, b in enumerate(block_exprs)
    ]
    side = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"), *blocks)
    blk_cols = [f"_blk{i}" for i in range(len(blocks))]
    a = side.select(
        F.col("_id").alias("a_id"), F.col("_text").alias("a_text"), *blk_cols
    )
    b = side.select(
        F.col("_id").alias("b_id"), F.col("_text").alias("b_text"), *blk_cols
    )
    return (
        a.join(b, on=blk_cols)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("dist", F.levenshtein("a_text", "b_text"))
        .filter(F.col("dist") <= max_dist)
        .select("a_id", "b_id", "a_text", "b_text", "dist")
    )
