"""Streaming continuous aggregate: event stream → incrementally maintained
rollup table (the hypertable continuous-aggregate shape, streaming twin of
``operators/rollup.py``).

A 100 TB metrics pipeline never recomputes rollups from scratch: each
micro-batch folds its partial aggregates into the stored rollup. Because
every measure is decomposable (count/sum/min/max — SURVEY A-family), the fold
is itself just a re-aggregation, and exact DECIMAL sums make the maintained
table bit-identical to a from-scratch rollup at any batch boundary
(tested in test_streaming_rollup).

Exactly-once-effective under replay: partials are staged per epoch with
``insert_new`` on (keys…, bucket_ts, _epoch) — a replayed micro-batch
(same epoch id, Structured Streaming's failure contract) inserts zero rows —
and the served rollup is the re-aggregation of the staged partials. The
stage grows by one row per (keys, bucket, epoch) and is compacted by
re-staging the folded table under the epoch floor (``compact_stage``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from schwab_elt_etl_pipeline_spark.streaming.runner import start_foreach_batch

from schwab_elt_etl_pipeline_spark.operators.rollup import rollup_minutes
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable


def fold_partials(staged: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate staged per-epoch partials to one row per (keys, bucket).

    Decomposable measures only — the same fold `rollup_coarser` applies
    across grains, applied here across epochs at the same grain.
    """
    return staged.groupBy(*keys, "bucket_ts").agg(
        F.sum("n").alias("n"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def run_streaming_rollup(
    events_stream: DataFrame,
    stage_table: ParquetTable,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    minutes: int = 1,
    checkpoint_dir: str = "",
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain a minute-grain rollup stage incrementally from a stream.

    Per micro-batch: aggregate the batch to per-bucket partials, tag with the
    epoch id, ``insert_new`` into the stage (replay-idempotent). Readers call
    :func:`fold_partials` (or read a periodically compacted fold).
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        partials = rollup_minutes(batch, keys, ts=ts, value=value, minutes=minutes)
        staged = partials.withColumn("_epoch", F.lit(batch_id).cast("long"))
        stage_table.insert_new(staged, keys=[*keys, "bucket_ts", "_epoch"])

    return start_foreach_batch(
        events_stream, process_batch, checkpoint_dir, trigger_seconds
    )


def compact_stage(stage_table: ParquetTable, keys: list[str]) -> int:
    """Fold the stage to one row per (keys, bucket) and rewrite it under the
    current epoch floor, so stage size stays O(buckets), not O(buckets ×
    epochs). The fold is associative so folding a fold is a no-op. Commits
    with ``base_version``: if a live streaming batch lands between the
    compactor's read and its flip, the compaction ABORTS
    (ConcurrentWriteConflict) instead of silently dropping that batch's
    partials — retry compaction at the next quiet moment.

    No-ops (returns the current version, or 0 when the table was never
    written) on a missing or empty stage: without the guard, ``read()`` of a
    never-written table raises, and an empty stage would stamp ``_epoch``
    NULL — breaking ``insert_new``'s key matching so replayed batches could
    re-insert.
    """
    if not stage_table.exists():
        return 0
    base = stage_table.current_version()
    staged = stage_table.read()
    max_epoch = staged.agg(F.max("_epoch")).first()[0]
    if max_epoch is None:  # empty stage — nothing to fold
        return base or 0
    # cast the folded measures BACK to the staged column types: re-summing
    # widens sums (decimal(28,6) → decimal(38,6)), and a post-compaction
    # append from rollup_minutes would then mix parquet physical types in
    # one version dir, breaking every later read of the stage. The fold is
    # a row-count reduction — values always fit the original widths.
    folded = fold_partials(staged, keys).withColumn(
        "_epoch", F.lit(max_epoch).cast("long")
    )
    folded = folded.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in staged.schema.fields
        ]
    )
    # base_version: a streaming batch committing between our read and this
    # flip must abort the compaction (its partials would silently vanish
    # from the current version while its checkpoint says it is done) —
    # compaction is safe to just retry later
    return stage_table.overwrite_versioned(folded, base_version=base)


def update_distinct_sketch_table(
    batch: DataFrame,
    table: ParquetTable,
    keys: list[str],
    ts: str = "ts",
    value: str = "user_id",
    lg_k: int = 12,
) -> None:
    """Incrementally maintain a per-(keys…, day) HLL sketch table — the
    operational twin of the batch ``a_hll_partitioned_merge`` pattern:
    distinct metrics at 100 TB are served from kilobyte sketches that any
    rollup window can union, never from a rescan of raw events.

    Per micro-batch: sketch ONLY the batch's rows, union-merge into the
    stored sketches for the touched (keys…, day) cells (semi-join probe —
    the sketch table is keys×days-sized, never event-sized), and MERGE the
    combined rows back. Replays are idempotent WITHOUT an epoch ledger:
    HLL union is a set union, so re-merging the same batch's sketch leaves
    every estimate unchanged — sketches are the rare aggregate where
    at-least-once delivery IS exactly-once semantics (pinned in
    test_streaming_rollup)."""
    new = batch.groupBy(*keys, F.to_date(ts).alias("day")).agg(
        F.expr(f"hll_sketch_agg({value}, {lg_k})").alias("sk")
    )
    if not table.exists():
        table.overwrite_versioned(new)
        return
    on = [*keys, "day"]
    touched = new.select(*on).distinct()
    cur = table.read().join(touched, on, "left_semi")
    combined = (
        cur.select(*on, "sk")
        .unionByName(new)
        .groupBy(*on)
        .agg(F.expr("hll_union_agg(sk)").alias("sk"))
    )
    table.merge(combined, keys=on)


def read_distinct_estimates(table: ParquetTable, keys: list[str]) -> DataFrame:
    """Serve distinct-count estimates from the sketch table: union-merge the
    per-day sketches per key group — any coarser grouping is the same cheap
    union, raw data is never touched."""
    return table.read().groupBy(*keys).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long").alias(
            "approx_distinct"
        ),
        F.count(F.lit(1)).alias("n_day_sketches"),
    )


def update_quantile_sketch_table(
    batch: DataFrame,
    table: ParquetTable,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    k: int = 200,
    epoch: int | None = None,
) -> None:
    """Incrementally maintain a per-(keys…, day) KLL quantile-sketch table —
    the quantile companion of :func:`update_distinct_sketch_table`, so a
    quantile threshold (the ``quality_quantile_gate`` shape) is served from
    kilobyte sketches instead of a raw rescan.

    Unlike HLL, KLL merge is a MULTISET union — re-merging a replayed
    batch's sketch would double-weight its values — so the replay contract
    is the epoch-delta ledger (``insert_new`` on (keys…, day, _epoch), the
    same protocol as the rollup stage and the ACF moments): a replayed
    epoch's delta keys all exist, nothing re-inserts. Each row also carries
    the exact row count ``n``, giving readers a free integrity cross-check
    (``kll_sketch_get_n_double`` must equal Σn).

    DataSketches KLL with parameter ``k`` bounds the one-sided rank error
    at ~1.7%/k^0.93 (k=200 → ~0.6% rank error, far inside the 1-percentile
    verdict window ``a_approx_quantiles`` established); sketches are
    mergeable without error growth across any grouping, so day cells union
    into weekly/global thresholds the way the HLL cells do."""
    new = (
        batch.filter(F.col(value).isNotNull())
        .groupBy(*keys, F.to_date(ts).alias("day"))
        .agg(
            F.expr(f"kll_sketch_agg_double({value}, {k})").alias("qsk"),
            F.count(value).alias("n"),
        )
        .withColumn("_epoch", F.lit(epoch).cast("long"))
    )
    table.insert_new(new, keys=[*keys, "day", "_epoch"])


def read_quantile_estimates(
    table: ParquetTable,
    keys: list[str],
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Serve quantile estimates from the sketch table at any grouping
    coarser than (or equal to) the maintained keys: merge the per-cell
    sketches per key group, read each requested quantile. Raw data is never
    touched; ``n`` is the exact row count behind each estimate.

    Determinism note: ``kll_merge`` retains samples, so the groupBy's
    partition-dependent merge ORDER can move an estimate within the rank
    guarantee across otherwise-identical reads (HLL's register-max union
    is commutative; KLL compaction is not). Consumers pin exact ``n`` and
    the rank window, never sketch-value bytes."""
    merged = table.read().groupBy(*keys).agg(
        F.expr("kll_merge_agg_double(qsk)").alias("qsk"),
        F.sum("n").alias("n"),
    )
    return merged.select(
        *keys,
        "n",
        *[
            F.expr(f"kll_sketch_get_quantile_double(qsk, {p})").alias(
                f"p{int(round(p * 100)):02d}"
            )
            for p in probs
        ],
    )


def consolidate_quantile_sketches(table: ParquetTable, keys: list[str]) -> None:
    """Collapse the epoch ledger to one NULL-epoch row per (keys…, day).
    Merging is lossless in the KLL guarantee (rank error never grows under
    union), and the exact ``n`` fold is bit-identical; the merged sketch
    BYTES may differ from the unconsolidated merge order, so the pin is the
    rank-error window plus exact n, not byte identity. Usual caveat: only
    after the checkpoint committed past the folded epochs — a consolidated
    epoch's delta key no longer exists, so an UNCOMMITTED replay would
    re-insert and double-weight."""
    cur = table.read()
    order = [f.name for f in cur.schema.fields]
    folded = (
        cur.groupBy(*keys, "day")
        .agg(
            F.expr("kll_merge_agg_double(qsk)").alias("qsk"),
            F.sum("n").cast("long").alias("n"),
        )
        .withColumn("_epoch", F.lit(None).cast("long"))
        .select(*order)
    )
    table.overwrite_versioned(folded)


def read_volume_drift(
    stage_table: ParquetTable, keys: list[str], k: float = 3.0
) -> DataFrame:
    """MAD drift flags over an incrementally maintained DAY-grain rollup
    stage (``run_streaming_rollup`` with ``minutes=1440``): fold the staged
    per-epoch partials, collapse to daily counts, apply the same robust
    gate as the batch monitor (catalog ``dq_volume_drift``) — the
    maintained-table read never touches raw events, so monitoring cost is
    O(|keys|×|days|) regardless of stream volume.
    """
    from schwab_elt_etl_pipeline_spark.operators.quality import mad_drift

    folded = fold_partials(stage_table.read(), keys)
    # re-aggregate AFTER the date cast: a stage maintained at a finer grain
    # (hour/minute buckets) would otherwise feed multiple rows per
    # (key, day) into the gate, and every daily median/MAD would silently
    # reflect sub-day volume; the groupBy is a no-op at day grain
    daily = (
        folded.select(*keys, F.col("bucket_ts").cast("date").alias("day"), "n")
        .groupBy(*keys, "day")
        .agg(F.sum("n").alias("n"))
    )
    return mad_drift(daily, keys, k=k)
