"""Streaming twin of the autocorrelation diagnostic (catalog ``t_acf_lags``).

The ARCHITECTURE "cross-batch boundary stitching" recipe, generalized from
one boundary row to a **last-K tail**: a lag-k pair reaches up to k events
back, so the pairs straddling a micro-batch boundary need the user's final
``K = max lag`` events from prior batches, not just the final one
(``markov_stream.py`` is the K=1 special case).

State, both epoch-stamped and ``insert_new``-idempotent:

- ``tails``: each epoch's per-user last K events
  ``(user_id, ts, event_id, value, _epoch)`` keyed on
  (user_id, event_id, _epoch). The probe takes the K latest rows per user
  across PRIOR epochs (current epoch excluded null-safely, so replays see
  their original state).
- ``moments``: per-epoch DELTA moment sums per (user, lag) —
  ``(n, s1, s2, s11, s22, s12)`` as exact DECIMAL sums, keyed on
  (user_id, lag, _epoch). Decimal sums are associative and exact, so the
  epoch-sum equals the single-pass batch sums bit-for-bit, and the final
  Pearson formula over their double casts reproduces ``t_acf_lags``
  EXACTLY (pinned by tests/test_streaming_acf.py).

Per micro-batch: prepend the prior tail to the batch per user (tail rows
tagged ``_old``), run ONE lag-window pass over the concatenation, and keep
only pairs whose LATER element is in the current batch — that counts every
within-batch pair once and every boundary pair once, and nothing twice.
All joins/windows key on the user column; the moments table is
(users × lags)-bounded.

Reference behavior mirrored: services/schwab_stream.py's rolling
session-statistics accumulation across websocket callbacks — here as
mergeable exact moment deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.query import StreamingQuery
from pyspark.sql.window import Window

from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.runner import start_foreach_batch

_DEC = "decimal(12,2)"


def _prior_tail(tails: ParquetTable, k: int, epoch: int | None) -> DataFrame:
    """The K latest prior events per user (current epoch excluded)."""
    prior = tails.read()
    if epoch is not None:
        prior = prior.filter(
            F.coalesce(F.col("_epoch") != F.lit(epoch), F.lit(True))
        )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        prior.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .select("user_id", "ts", "event_id", "value")
    )


def update_acf_moments(
    batch: DataFrame,
    tails: ParquetTable,
    moments: ParquetTable,
    lags: int = 3,
    epoch: int | None = None,
) -> None:
    """Merge one micro-batch's lag-pair moment deltas (boundary pairs
    included) and record the batch's per-user last-K tail."""
    ev = batch.select("user_id", "ts", "event_id", "value").localCheckpoint(
        eager=True  # feeds the pair pass and the tail append
    )
    ext = ev.withColumn("_old", F.lit(0))
    if tails.exists():
        ext = _prior_tail(tails, lags, epoch).withColumn(
            "_old", F.lit(1)
        ).unionByName(ext)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    y = F.col("value").cast(_DEC)
    lagged = ext.select(
        "user_id",
        "_old",
        y.alias("y"),
        *[F.lag(y, k).over(w).alias(f"y_{k}") for k in range(1, lags + 1)],
    )
    pairs = (
        lagged.filter(F.col("_old") == 0)
        .select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"),
                            F.col("y").alias("yt"),
                            F.col(f"y_{k}").alias("yl"),
                        )
                        for k in range(1, lags + 1)
                    ]
                )
            ).alias("p"),
        )
        .select("user_id", "p.lag", "p.yt", "p.yl")
        .filter(F.col("yl").isNotNull())
    )
    delta = (
        pairs.groupBy("user_id", "lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("yt").alias("s1"),
            F.sum("yl").alias("s2"),
            F.sum(F.col("yt") * F.col("yt")).alias("s11"),
            F.sum(F.col("yl") * F.col("yl")).alias("s22"),
            F.sum(F.col("yt") * F.col("yl")).alias("s12"),
        )
        .withColumn("_epoch", F.lit(epoch).cast("long"))
    )
    moments.insert_new(delta, keys=["user_id", "lag", "_epoch"])
    wt = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    tail = (
        ev.withColumn("_rk", F.row_number().over(wt))
        .filter(F.col("_rk") <= lags)
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            F.lit(epoch).cast("long").alias("_epoch"),
        )
    )
    tails.insert_new(tail, keys=["user_id", "event_id", "_epoch"])


def current_moments(moments: ParquetTable) -> DataFrame:
    """Live per-(user, lag) moment sums — epoch deltas summed out (decimal
    addition is exact, so this equals the single-pass batch sums)."""
    return moments.read().groupBy("user_id", "lag").agg(
        F.sum("n").alias("n_pairs"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s11").alias("s11"),
        F.sum("s22").alias("s22"),
        F.sum("s12").alias("s12"),
    )


def acf_from_moments(m: DataFrame) -> DataFrame:
    """(user_id, lag, n_pairs, acf) from merged moments — the identical
    IEEE expression as the batch query (double casts of exact decimals,
    ROUND 6, ``+ 0.0`` −0.0 canonicalization, NULL on degenerate series)."""
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    n = d("n_pairs")
    varx = n * d("s11") - d("s1") * d("s1")
    vary = n * d("s22") - d("s2") * d("s2")
    cov = n * d("s12") - d("s1") * d("s2")
    ok = (F.col("n_pairs") >= 2) & (varx > 0.0) & (vary > 0.0)
    return m.select(
        "user_id",
        "lag",
        "n_pairs",
        F.when(ok, F.round(cov / (F.sqrt(varx) * F.sqrt(vary)), 6) + 0.0).alias(
            "acf"
        ),
    )


def consolidate_tails(tails: ParquetTable, lags: int = 3) -> None:
    """Collapse the tail history to the K latest rows per user, NULL-epoch.

    Without compaction the tails table holds up to K rows per (user, epoch)
    forever and ``_prior_tail``'s row_number window ranks the ENTIRE history
    each micro-batch — per-trigger probe cost growing with stream age. After
    consolidation the table is exactly (users × K) rows and the probe result
    is unchanged (``_prior_tail`` already keeps only the K latest).

    Same caveat as ``consolidate_counts`` / ``consolidate_last_seen``: run
    only once the checkpoint has committed past all epochs — a replayed
    epoch's null-safe exclusion cannot hide NULL-epoch rows, so an
    UNCOMMITTED epoch replayed after consolidation would see its own events
    in the prior tail and double-count boundary pairs.
    """
    latest = _prior_tail(tails, lags, epoch=None).withColumn(
        "_epoch", F.lit(None).cast("long")
    )
    tails.overwrite_versioned(latest)


def consolidate_moments(moments: ParquetTable) -> None:
    """Collapse per-epoch moment deltas into one NULL-epoch row per
    (user, lag). Decimal addition is exact and associative, so the
    consolidated sums — and therefore ``acf_from_moments`` — are
    bit-identical to the unconsolidated epoch-sum. Sums are cast back to
    the table's on-disk types (Spark widens re-aggregated decimals; a
    drifting schema would poison later ``insert_new`` appends into the
    same version dir). Replay caveat as :func:`consolidate_tails`: a
    consolidated epoch's (user, lag, _epoch) key no longer exists, so an
    UNCOMMITTED epoch replayed afterwards would re-insert its delta and
    double-count.
    """
    cur = moments.read()
    types = {f.name: f.dataType.simpleString() for f in cur.schema.fields}
    sums = ["n", "s1", "s2", "s11", "s22", "s12"]
    folded = (
        cur.groupBy("user_id", "lag")
        .agg(*[F.sum(c).alias(c) for c in sums])
        .select(
            "user_id",
            "lag",
            *[F.col(c).cast(types[c]).alias(c) for c in sums],
            F.lit(None).cast("long").alias("_epoch"),
        )
    )
    moments.overwrite_versioned(folded)


def acf_stream(
    stream: DataFrame,
    tails: ParquetTable,
    moments: ParquetTable,
    checkpoint_dir: str,
    lags: int = 3,
    trigger_seconds: int | None = None,
) -> StreamingQuery:
    """Maintain the per-user ACF moments incrementally over an event stream."""

    def _sink(batch: DataFrame, epoch: int) -> None:
        update_acf_moments(batch, tails, moments, lags=lags, epoch=epoch)

    return start_foreach_batch(
        stream, _sink, checkpoint_dir, trigger_seconds, output_mode="update"
    )
