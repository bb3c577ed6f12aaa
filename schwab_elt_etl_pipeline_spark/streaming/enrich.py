"""Stream-stream enrichment: option ticks joined with the underlying's
recent marks, both unbounded streams.

The reference enriches option data with the underlying only at rest (the
Gold strike-range scan, docs/sql_server.md:429-434) or via the Redis
latest-quote cache (tools/redis_cache.py:19-27). A streaming engine can do it
in-flight: a watermarked stream-stream join with a time-band condition —
each option tick picks up every $SPX mark from the preceding ``max_lag``
window, and the as-of reduction (latest mark at-or-before the tick) runs as
a chained streaming aggregation.

State bound: each side buffers only rows newer than (watermark − band), so
state is O(rate × (watermark + band)) — the two knobs are explicit SLAs, not
unbounded queues. Spark's stream-stream join REQUIRES an equality predicate,
so the band becomes a bucketed equi-key exactly like the batch interval join
(`operators/interval.py`): time quantizes into ``max_lag``-sized buckets, the
option side probes its own and the previous bucket (2× fan-out), and the
BETWEEN stays as residual — which also hash-partitions the join state instead
of replicating it. This is the streaming twin of the batch as-of join
(`t_asof_enrich`), same semantics, incremental execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_underlying(
    quotes: DataFrame,
    max_lag_minutes: int = 2,
    watermark: str = "5 minutes",
    reduce_latest: bool = True,
) -> DataFrame:
    """Join each option tick with $SPX marks within ``max_lag_minutes``
    before it.

    ``quotes`` is the raw mixed stream (QUOTES_STREAM shape: option rows
    carry fields 37/38, underlying rows 3/35). Output per option tick:
    (symbol, opt_time, mark, spx, spx_time) — with ``reduce_latest`` the
    as-of reduction keeps only the newest underlying mark per tick (chained
    stateful aggregation; needs watermark propagation, on by default in
    Spark 4). Works identically on a batch DataFrame.
    """
    lag_ms = max_lag_minutes * 60_000
    opt_bucket = F.floor(F.col("38") / lag_ms)
    opt = (
        quotes.filter(F.col("37").isNotNull() & F.col("38").isNotNull())
        .filter(F.col("symbol") != "$SPX")
        .select(
            "symbol",
            F.timestamp_millis(F.col("38")).alias("opt_time"),
            F.col("37").alias("mark"),
            F.explode(F.array(opt_bucket, opt_bucket - 1)).alias("bucket"),
        )
        .withWatermark("opt_time", watermark)
    )
    und = (
        quotes.filter(F.col("symbol") == "$SPX")
        .filter(F.col("3").isNotNull() & F.col("35").isNotNull())
        .select(
            F.timestamp_millis(F.col("35")).alias("spx_time"),
            F.col("3").alias("spx"),
            F.floor(F.col("35") / lag_ms).alias("bucket"),
        )
        .withWatermark("spx_time", watermark)
    )
    pairs = (
        opt.alias("opt")
        .join(
            und.alias("und"),
            F.expr(
                "opt.bucket = und.bucket AND spx_time <= opt_time "
                f"AND spx_time > opt_time - interval {max_lag_minutes} minutes"
            ),
            "inner",
        )
        .select("symbol", "opt_time", "mark", "spx", "spx_time")
    )
    if not reduce_latest:
        return pairs
    return pairs.groupBy("symbol", "opt_time", "mark").agg(
        F.max_by("spx", "spx_time").alias("spx"),
        F.max("spx_time").alias("spx_time"),
    )
