"""Streaming continuous-aggregate maintenance: the incrementally maintained
rollup must equal a from-scratch batch rollup, survive replay without
double-counting, and stay compact."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.rollup import rollup_minutes, rollup_read
from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.rollup_stream import (
    compact_stage,
    fold_partials,
    run_streaming_rollup,
)

KEYS = ["event_type"]


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="roll_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_feed(spark, sf_dir, d, n_files=3):
    """Split the events table into files so availableNow consumes them as
    separate micro-batches (maxFilesPerTrigger=1)."""
    ev = load_table(spark, sf_dir, "events")
    ev.withColumn("_f", F.col("event_id") % n_files).repartition("_f").write.partitionBy(
        "_f"
    ).parquet(d + "/in")
    return ev.schema


def _read_feed(spark, schema, d):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/in")
    )


def test_streaming_rollup_equals_batch(spark, sf_dir, dirs):
    schema = _write_feed(spark, sf_dir, dirs)
    stage = ParquetTable(spark, dirs + "/stage")
    q = run_streaming_rollup(
        _read_feed(spark, schema, dirs), stage, KEYS, checkpoint_dir=dirs + "/ckpt"
    )
    q.awaitTermination(120)

    maintained = rollup_read(fold_partials(stage.read().drop("_f"), KEYS))
    batch = rollup_read(rollup_minutes(load_table(spark, sf_dir, "events"), KEYS))
    assert maintained.exceptAll(batch).count() == 0
    assert batch.exceptAll(maintained).count() == 0

    # replay: re-running the whole stream from a fresh checkpoint must not
    # double-count (epoch-keyed insert_new makes the stage idempotent)
    n_before = stage.read().count()
    q2 = run_streaming_rollup(
        _read_feed(spark, schema, dirs), stage, KEYS, checkpoint_dir=dirs + "/ckpt2"
    )
    q2.awaitTermination(120)
    assert stage.read().count() == n_before
    maintained2 = rollup_read(fold_partials(stage.read().drop("_f"), KEYS))
    assert maintained2.exceptAll(batch).count() == 0

    # compaction folds the stage to one row per (keys, bucket) and preserves
    # the served result
    compact_stage(stage, KEYS)
    folded = stage.read()
    assert folded.count() == folded.select(*KEYS, "bucket_ts").distinct().count()
    maintained3 = rollup_read(fold_partials(folded, KEYS))
    assert maintained3.exceptAll(batch).count() == 0


def test_compact_stage_guards_missing_and_empty(spark, tmp_path):
    """compact_stage must no-op on a never-written or empty stage instead of
    raising or writing NULL-epoch rows that break replay idempotence."""
    from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
    from schwab_elt_etl_pipeline_spark.streaming.rollup_stream import compact_stage

    missing = ParquetTable(spark, str(tmp_path / "never_written"))
    assert compact_stage(missing, keys=["event_type"]) == 0
    assert not missing.exists()

    empty = ParquetTable(spark, str(tmp_path / "empty_stage"))
    schema = ("event_type string, bucket_ts timestamp_ntz, n long, "
              "sum_value decimal(18,6), min_value double, max_value double, _epoch long")
    empty.overwrite_versioned(spark.createDataFrame([], schema))
    v = compact_stage(empty, keys=["event_type"])
    assert v == empty.current_version()  # unchanged, no NULL-epoch write
    assert empty.read().count() == 0


def test_incremental_distinct_sketch_table(spark):
    """Two-batch sketch maintenance must estimate exact distincts within the
    HLL envelope, and replaying a batch must leave every estimate unchanged
    (sketch union is a set union — at-least-once IS exactly-once here)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.streaming.rollup_stream import (
        read_distinct_estimates,
        update_distinct_sketch_table,
    )

    d = tempfile.mkdtemp(prefix="sk_tbl_")
    try:
        table = ParquetTable(spark, d)

        def mk(rows):
            return spark.createDataFrame(
                rows, "event_type string, ts timestamp_ntz, user_id long"
            )

        import datetime as dt

        t0 = dt.datetime(2024, 6, 17, 10, 0)
        b1 = mk([("a", t0, u) for u in range(300)] + [("b", t0, u) for u in range(50)])
        b2 = mk(
            [("a", t0 + dt.timedelta(days=1), u) for u in range(150, 450)]
            + [("b", t0, u) for u in range(25, 75)]
        )
        update_distinct_sketch_table(b1, table, keys=["event_type"])
        update_distinct_sketch_table(b2, table, keys=["event_type"])

        est = {
            r["event_type"]: (r["approx_distinct"], r["n_day_sketches"])
            for r in read_distinct_estimates(table, ["event_type"]).collect()
        }
        # exact: a = 0..449 (450), b = 0..74 (75)
        assert est["a"][1] == 2 and est["b"][1] == 1
        assert abs(est["a"][0] - 450) <= 0.05 * 450
        assert abs(est["b"][0] - 75) <= max(0.05 * 75, 2)

        # replay batch 2: estimates bit-identical (union idempotence)
        update_distinct_sketch_table(b2, table, keys=["event_type"])
        est2 = {
            r["event_type"]: (r["approx_distinct"], r["n_day_sketches"])
            for r in read_distinct_estimates(table, ["event_type"]).collect()
        }
        assert est2 == est
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_incremental_quantile_sketch_table(spark, sf_dir):
    """Maintained per-(event_type, day) KLL sketches must serve quantiles
    inside the exact rank window [p-0.01, p+0.01] (the a_approx_quantiles
    verdict discipline), a replayed epoch must change nothing (epoch-delta
    ledger), and consolidation must keep exact n and stay in-window. Also
    serves the quality_quantile_gate shape: a GLOBAL p20 threshold merged
    from the day cells."""
    import shutil
    import tempfile

    from schwab_elt_etl_pipeline_spark.streaming.rollup_stream import (
        consolidate_quantile_sketches,
        read_quantile_estimates,
        update_quantile_sketch_table,
    )

    d = tempfile.mkdtemp(prefix="qsk_tbl_")
    try:
        table = ParquetTable(spark, d)
        ev = load_table(spark, sf_dir, "events")
        b1 = ev.filter(F.col("event_id") % 2 == 0)
        b2 = ev.filter(F.col("event_id") % 2 == 1)
        update_quantile_sketch_table(b1, table, keys=KEYS, epoch=1)
        update_quantile_sketch_table(b2, table, keys=KEYS, epoch=2)

        def est():
            return {
                r["event_type"]: (r["n"], r["p50"], r["p90"])
                for r in read_quantile_estimates(
                    table, KEYS, probs=(0.5, 0.9)
                ).collect()
            }

        # exact rank windows from raw events (the oracle-side discipline)
        windows = {
            r["event_type"]: (r["n"], r["w"])
            for r in ev.filter(F.col("value").isNotNull())
            .groupBy("event_type")
            .agg(
                F.count("value").alias("n"),
                F.expr(
                    "percentile(value, array(0.49, 0.51, 0.89, 0.91))"
                ).alias("w"),
            )
            .collect()
        }

        def in_windows(got):
            assert set(got) == set(windows)
            for et, (n, p50, p90) in got.items():
                wn, w = windows[et]
                assert n == wn, et  # exact count rides the ledger
                assert w[0] - 1e-9 <= p50 <= w[1] + 1e-9, (et, p50, w)
                assert w[2] - 1e-9 <= p90 <= w[3] + 1e-9, (et, p90, w)

        snap = est()
        in_windows(snap)

        # replayed epoch: delta keys exist, zero rows insert. Estimates are
        # NOT pinned bit-identical: kll_merge retains samples, so the
        # groupBy's partition-dependent merge ORDER can shift an estimate
        # within the rank guarantee even over identical rows (HLL's
        # register-max union is commutative; KLL's compaction is not) —
        # the stable contract is exact n + the rank window.
        n_rows = table.read().count()
        update_quantile_sketch_table(b2, table, keys=KEYS, epoch=2)
        assert table.read().count() == n_rows
        replayed = est()
        assert {k: v[0] for k, v in replayed.items()} == {
            k: v[0] for k, v in snap.items()
        }
        in_windows(replayed)

        # global threshold (quality_quantile_gate shape): merge ALL cells
        thr = read_quantile_estimates(table, [], probs=(0.2,)).collect()[0]
        gw = ev.agg(
            F.expr("percentile(value, array(0.19, 0.21))").alias("w")
        ).collect()[0]["w"]
        assert gw[0] - 1e-9 <= thr["p20"] <= gw[1] + 1e-9

        # consolidation: one NULL-epoch row per cell, exact n, still in-window
        consolidate_quantile_sketches(table, KEYS)
        assert table.read().filter(F.col("_epoch").isNotNull()).count() == 0
        got = est()
        assert {k: v[0] for k, v in got.items()} == {
            k: v[0] for k, v in snap.items()
        }
        in_windows(got)

        # maintenance continues on the consolidated base
        update_quantile_sketch_table(b2.limit(0), table, keys=KEYS, epoch=3)
        in_windows(est())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_volume_drift_equals_batch(spark, sf_dir, dirs):
    """The incrementally maintained DAY-grain stage must serve the SAME
    drift verdicts as the batch monitor computed from raw events
    (catalog dq_volume_drift), and replay must not change them."""
    from schwab_elt_etl_pipeline_spark.operators.quality import mad_drift
    from schwab_elt_etl_pipeline_spark.streaming.rollup_stream import (
        read_volume_drift,
    )

    schema = _write_feed(spark, sf_dir, dirs)
    stage = ParquetTable(spark, dirs + "/stage_day")
    q = run_streaming_rollup(
        _read_feed(spark, schema, dirs),
        stage,
        KEYS,
        minutes=1440,
        checkpoint_dir=dirs + "/ckpt_day",
    )
    q.awaitTermination(120)

    streamed = read_volume_drift(stage, KEYS)

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    batch = mad_drift(daily, KEYS, k=3.0)

    s_cols = ["event_type", "day", "n", "med", "mad", "is_drift"]
    streamed_sel = streamed.select(*s_cols)
    batch_sel = batch.select(*s_cols)
    assert streamed_sel.exceptAll(batch_sel).count() == 0
    assert batch_sel.exceptAll(streamed_sel).count() == 0

    # replay from a fresh checkpoint: verdicts unchanged
    q2 = run_streaming_rollup(
        _read_feed(spark, schema, dirs),
        stage,
        KEYS,
        minutes=1440,
        checkpoint_dir=dirs + "/ckpt_day2",
    )
    q2.awaitTermination(120)
    streamed2 = read_volume_drift(stage, KEYS).select(*s_cols)
    assert streamed2.exceptAll(batch_sel).count() == 0
    assert batch_sel.exceptAll(streamed2).count() == 0


def test_stream_resumes_cleanly_after_compaction(spark, sf_dir, dirs):
    """Appends AFTER a compaction must keep the stage readable: compaction
    re-sums (which would widen decimal types) — the folded table must be
    cast back to the staged schema so post-compaction files match."""
    schema = _write_feed(spark, sf_dir, dirs, n_files=2)
    stage = ParquetTable(spark, dirs + "/stage_c")
    q = run_streaming_rollup(
        _read_feed(spark, schema, dirs), stage, KEYS, checkpoint_dir=dirs + "/ck1"
    )
    q.awaitTermination(120)
    before = stage.read().schema
    compact_stage(stage, KEYS)
    assert stage.read().schema == before  # same physical column types

    # new data arrives after the compaction: same stage keeps working
    ev = load_table(spark, sf_dir, "events")
    extra = ev.withColumn("event_id", F.col("event_id") + 10_000_000).limit(500)
    extra.write.mode("append").parquet(dirs + "/in/_f=9")
    q2 = run_streaming_rollup(
        _read_feed(spark, schema, dirs), stage, KEYS, checkpoint_dir=dirs + "/ck1"
    )
    q2.awaitTermination(120)
    folded = fold_partials(stage.read().drop("_f"), KEYS)
    assert folded.count() > 0  # the read crosses pre/post-compaction files
    batch = rollup_minutes(
        load_table(spark, sf_dir, "events").unionByName(extra), KEYS
    )
    maintained = rollup_read(folded)
    want = rollup_read(batch)
    assert maintained.exceptAll(want).count() == 0
    assert want.exceptAll(maintained).count() == 0
