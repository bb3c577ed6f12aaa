"""Streaming continuous-aggregate maintenance: the incrementally maintained
rollup must equal a from-scratch batch rollup, survive replay without
double-counting, and stay compact."""

from __future__ import annotations

import shutil
import tempfile

import pytest
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
