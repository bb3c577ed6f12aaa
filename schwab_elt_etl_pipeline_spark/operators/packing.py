"""Bin-packing sequence assignment for training-data preparation.

``catalog/curation2.py sequence_packing`` is concatenate-and-chunk: zero
token waste, but documents straddle sequence boundaries (attention-mask
cost at training time). This module adds the packing that keeps documents
WHOLE: deterministic first-fit-decreasing (FFD) — docs sorted by length
descending (doc id ascending on ties), each placed in the lowest-numbered
bin with enough remaining capacity, a new bin opened when none fits. FFD
guarantees <= (11/9)*OPT + 6/9 bins (Dosa 2007), and no document ever
crosses a boundary.

Distributed shape: FFD is inherently sequential PER SHARD (each placement
depends on all earlier ones), so the shard is the parallelism unit — one
groupBy(shard) collects the doc lengths and the whole greedy loop runs as
ONE higher-order ``aggregate`` expression over the sorted array (the
``viterbi_segment``/``mmr_rerank_topk`` discipline: no driver loop, no
UDF, no extra shuffle). At 100 TB shards are sized to the packing context
(the same contract the concat-and-chunk form documents) — e.g. hash
sub-sharding — since a shard's doc list must fit one task.

Reference behavior mirrored: none (the reference has no training-prep
packing); this extends the LLM-pipeline brief's sequence-packing story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# First bin index (1-based) whose remaining capacity fits the doc; 0 when
# none does (incl. the empty state — NOT sequence(1, size(rem)), which
# DESCENDS to [1, 0] on an empty array and indexes out of bounds). d.nl is
# the NEGATED length (the sort key), so the fit test is rem >= -nl.
_FIT = (
    "aggregate(st.rem, named_struct('p', 0, 'k', 0),"
    " (a, r) -> named_struct("
    "'p', CASE WHEN a.p = 0 AND r >= -d.nl THEN a.k + 1 ELSE a.p END,"
    " 'k', a.k + 1)).p"
)


def _ffd_expr(capacity: int) -> str:
    return f"""
    aggregate(
      ds,
      named_struct(
        'rem', cast(array() as array<bigint>),
        'out', cast(array() as array<struct<did:bigint, len:bigint, bin:int>>)),
      (st, d) -> named_struct(
        'rem',
          CASE WHEN {_FIT} = 0 THEN st.rem || array({capacity}L + d.nl)
          ELSE transform(st.rem, (r, i) ->
                 CASE WHEN i = {_FIT} - 1 THEN r + d.nl ELSE r END)
          END,
        'out', st.out || array(named_struct(
          'did', d.did,
          'len', -d.nl,
          'bin', cast(CASE WHEN {_FIT} = 0 THEN size(st.rem) + 1
                      ELSE {_FIT} END as int)))
      )
    ).out"""


def ffd_pack(
    docs: DataFrame,
    capacity: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "len",
) -> DataFrame:
    """First-fit-decreasing packing of (id, shard, len) rows into bins of
    ``capacity`` tokens. Lengths must be pre-clamped to <= capacity (the
    caller's contract — an oversize doc would open a bin it overflows).

    Output: (id, shard, len, bin) with ``bin`` 1-based per shard; total
    bins per shard = max(bin). Deterministic: the FFD order is
    (len DESC, id ASC) and every step is integer arithmetic, so the
    assignment is oracle-checkable bit-for-bit (see SEQUENCE_PACKING_FFD
    in catalog/curation2.py — a per-shard recursive-CTE greedy).
    """
    packed = (
        docs.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col(len_col)).cast("long").alias("nl"),
                        F.col(id_col).cast("long").alias("did"),
                    )
                )
            ).alias("ds")
        )
        .select("shard", F.explode(F.expr(_ffd_expr(capacity))).alias("o"))
    )
    return packed.select(
        F.col("o.did").alias(id_col),
        F.col("shard").alias(shard_col),
        F.col("o.len").alias(len_col),
        F.col("o.bin").alias("bin"),
    )
