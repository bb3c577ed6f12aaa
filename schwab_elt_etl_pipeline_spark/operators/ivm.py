"""Incremental view maintenance (IVM): keep a denormalized join view in
sync with its base tables by applying change-data-feed deltas, never
recomputing the full join.

At 100 TB the denormalized fact⋈dim view is often the most-read table in
the warehouse and far too large to rebuild per batch. Both maintenance
primitives here are O(delta)-shaped on the join side:

- fact-side delta: drop the view rows of changed fact keys, join ONLY the
  delta's surviving rows against the dimension (broadcast), append;
- dim-side delta: drop the view rows of changed dimension keys, rebuild
  just those slices by semi-joining the fact to the changed keys.

The view rewrite itself uses the warehouse's versioned overwrite (atomic
pointer flip; with ``cluster_by`` on the key the anti-join rewrite prunes
by footer stats instead of scanning the whole view). Correctness contract:
after applying a delta the view equals the from-scratch join — asserted,
not assumed, in tests/test_ivm.py, including interleaved fact and dim
batches with inserts, updates, and deletes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable


def build_join_view(
    view: ParquetTable, fact: DataFrame, dim: DataFrame, join_key: str
) -> int:
    """Materialize the initial denormalized view = fact ⋈ dim."""
    return view.overwrite_versioned(fact.join(F.broadcast(dim), join_key))


def apply_fact_delta(
    view: ParquetTable,
    fact_delta: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    join_key: str,
) -> int:
    """Fold a fact-table CDF batch (``ParquetTable.diff`` shape: full rows +
    ``_change_type`` ∈ {insert, update, delete}) into the view.

    Deletes and updates remove their old view rows via one key anti-join;
    inserts and updates re-enter through a delta-sized join against the
    dimension. The dimension never rescans the fact, the fact never
    rescans the view.
    """
    keys = list(fact_keys)
    changed = fact_delta.select(*keys).distinct()
    remaining = view.read().join(changed, keys, "left_anti")
    additions = (
        fact_delta.filter(F.col("_change_type") != "delete")
        .drop("_change_type")
        .join(F.broadcast(dim), join_key)
    )
    return view.overwrite_versioned(remaining.unionByName(additions))


def apply_dim_delta(
    view: ParquetTable,
    dim_delta: DataFrame,
    fact: DataFrame,
    dim: DataFrame,
    join_key: str,
) -> int:
    """Fold a dimension-table CDF batch into the view: every view row whose
    dimension key changed is dropped, and the affected slices are rebuilt
    by semi-joining the CURRENT fact to the changed keys and joining the
    CURRENT dimension (deleted dim keys simply produce no rebuilt rows —
    inner-join views lose their facts, matching the from-scratch join)."""
    changed = dim_delta.select(join_key).distinct()
    remaining = view.read().join(changed, join_key, "left_anti")
    rebuilt = fact.join(F.broadcast(changed), join_key, "left_semi").join(
        F.broadcast(dim), join_key
    )
    return view.overwrite_versioned(remaining.unionByName(rebuilt))
