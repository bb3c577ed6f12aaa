"""Conf-gated subtree pinning for shared operators.

Several operators compute one expensive subtree (exchange + sort + windows
over the full input) that feeds two consumers — the per-row output and a
summary/aggregate branch. Spark does not CSE duplicate logical subtrees, so
without a materialization boundary the subtree executes once per consumer.
``localCheckpoint(eager=False)`` dedups it, but the pin is a TRADE, not a
free win (r13 verdict #3 / guide §5):

- it materializes the WHOLE intermediate to executor local storage (memory
  then disk) — at 100 TB that doubles the storage high-water mark;
- localCheckpoint is non-reliable by contract: lineage is truncated, so a
  lost executor kills the job instead of recomputing;
- blocks stay pinned until the session drops them (bench/driver call
  ``clearCache()``; long-lived sessions that invoke these operators in a
  loop must do the same or opt out);
- a streaming DataFrame cannot be checkpointed this way at all (the
  operators' incremental twins live in ``streaming/``).

Policy: the pin defaults ON (it wins locally and on clusters whose cores
are busy — duplicate subtree work is only hidden when there are idle
cores), and callers at scale who prefer lineage + single-pass storage over
the dedup opt out per session:

    spark.conf.set("spark.schwabEltEtl.pinSharedSubtrees", "false")

Only FULL-DATA pins route through this gate. Small reused aggregates (a
|sources|-row marginal, a 16-byte-per-doc hash table) are pinned
unconditionally at their call sites — their storage cost is nil at any
scale and the recompute they avoid is a full corpus pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Session conf gating the full-data pins (default on).
PIN_CONF = "spark.schwabEltEtl.pinSharedSubtrees"


def pin_shared(df: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=False)`` unless the session opted out.

    With the pin disabled the operator is still correct — the shared
    subtree is simply recomputed per consumer (one extra pass of the same
    exchange+sort+window work, no extra storage, lineage intact).
    """
    enabled = df.sparkSession.conf.get(PIN_CONF, "true")
    if str(enabled).lower() == "false":
        return df
    return df.localCheckpoint(eager=False)
