"""Distributed prefix scan — global running aggregates without a
single-partition window.

SQL's ``SUM(x) OVER (ORDER BY k)`` with no PARTITION BY is the textbook
scale-killer in Spark: the physical plan is one ``SinglePartition`` exchange
and every row of the table flows through one task. The reference engine leans
on exactly this shape for running balances and cumulative-weight scans
(``docs/sql_server.md`` running-total idioms); at 100 TB a faithful
translation would serialize the whole table.

This module implements the classic two-phase parallel scan (Blelloch) with
DataFrame primitives:

1. ``repartitionByRange`` on the order key — partition *p* holds a contiguous
   key range, and ranges are monotone in ``spark_partition_id()``;
2. a per-partition window (partitioned by the partition id — shuffle-free,
   the data is already there) computes the *local* running aggregate;
3. per-partition totals — a frame bounded by the partition COUNT, not the
   row count — are cumulated with one tiny single-partition window (≤
   ``num_partitions`` rows, the one place a global window is safe) and
   broadcast-joined back as each partition's *offset*;
4. the global running value is ``local ⊕ offset`` (sum/max are associative).

Both the local branch and the totals branch consume the SAME materialized
range exchange: the ranged frame is local-checkpointed, so downstream
branches share one concrete RDD with one ``RangePartitioner`` — identical
boundaries and ``spark_partition_id()`` assignments by construction. Without
this, Catalyst plans the exchange twice (column pruning gives the branches
different scan schemas, so no ``ReusedExchange``), and ``RangePartitioner``'s
reservoir sample is order-dependent once a partition exceeds the
per-partition sample size — upstream-shuffled inputs (or task retries) could
silently diverge between evaluations and misalign the offsets. Note the
explicit-``numPartitions`` range exchange is a ``REPARTITION_BY_NUM`` shuffle
origin, which AQE never coalesces — partition ids stay monotone in the order
key. The skew case is pinned in tests/test_prefix.py against a
single-partition-window reference.

Wall-clock cost: one range shuffle of the data + one bounded broadcast —
versus the SinglePartition plan's full serialization. The combine step is the
same trick MPI calls exclusive-scan-plus-local-offset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__prefix_pid"
_LOCAL = "__prefix_local"
_PTOT = "__prefix_ptot"
_OFF = "__prefix_off"

_AGGS = {"sum": F.sum, "max": F.max, "min": F.min}


def prefix_agg(
    df: DataFrame,
    order_by: Sequence[str],
    value: str,
    out: str,
    how: str = "sum",
    inclusive: bool = True,
    total_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out`` = running ``how``-aggregate of ``value`` over the GLOBAL
    order defined by ``order_by`` — without ever shuffling the data to one
    partition.

    ``order_by`` should be a total order (include a unique tiebreaker);
    rows that compare equal are cumulated in an engine-chosen order, which
    matters for ``sum`` prefix semantics but not for the final total.

    ``inclusive=False`` gives the exclusive scan (strictly-before rows); the
    first row's exclusive prefix is NULL (no identity element is invented —
    ``sum``'s 0 and ``max``'s -inf are the caller's call).

    ``total_out`` optionally appends the grand total as a column on every row
    (same broadcast, no extra pass) — the idiom that replaces a 1-row
    crossJoin for "fraction of total" queries.

    NULL ``value`` rows are transparent to the aggregate (SQL semantics) but
    still receive the running value of their predecessors.
    """
    if how not in _AGGS:
        raise ValueError(f"how must be one of {sorted(_AGGS)}, got {how!r}")
    agg = _AGGS[how]
    n_part = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    order_cols = [F.col(c) for c in order_by]

    # localCheckpoint (lazy) pins ONE concrete RDD behind both downstream
    # branches: the range boundaries are sampled once and the pid column is
    # identical everywhere it is read. Lazy (not eager) so building the plan
    # stays action-free; the first action materializes and persists the
    # ranged partitions (MEMORY_AND_DISK), and a lost block fails the job
    # loudly instead of recomputing with a possibly different sample.
    ranged = (
        df.repartitionByRange(n_part, *order_cols)
        .localCheckpoint(eager=False)
        .withColumn(_PID, F.spark_partition_id())
    )

    hi = 0 if inclusive else -1
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = ranged.withColumn(_LOCAL, agg(value).over(w_local))

    # Per-partition totals: ≤ n_part rows. The cumulative-offset window is
    # single-partition BY DESIGN — its frame is bounded by the partition
    # count, never the data size. ``rangeBetween`` not needed: _PID is unique
    # per row here.
    totals = ranged.groupBy(_PID).agg(agg(value).alias(_PTOT))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(_OFF, agg(_PTOT).over(w_off))
    if total_out is not None:
        w_all = Window.orderBy(_PID).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = offsets.withColumn(total_out, agg(_PTOT).over(w_all))
    offsets = offsets.drop(_PTOT)

    joined = local.join(F.broadcast(offsets), _PID, "left")
    # local ⊕ offset with SQL null transparency: either side missing (first
    # partition's offset, empty exclusive frame) falls back to the other;
    # both missing → NULL.
    lo, off = F.col(_LOCAL), F.col(_OFF)
    if how == "sum":
        combined = F.coalesce(lo + off, lo, off)
    else:  # max / min: greatest/least skip NULLs natively
        combined = (F.greatest if how == "max" else F.least)(lo, off)
    return joined.withColumn(out, combined).drop(_PID, _LOCAL, _OFF)
