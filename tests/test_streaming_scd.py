"""Streaming SCD2 as-of enrichment: version-correct labels, parity with the
batch join, dimension updates visible to later batches, replay idempotence."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.scd import scd2_apply, scd2_init
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable
from schwab_elt_etl_pipeline_spark.streaming.scd_enrich import (
    enrich_batch_asof,
    start_scd2_enrich,
)

_TS = "timestamp_ntz"


def _dim_df(spark):
    t1 = F.lit("1995-01-01 00:00:00").cast(_TS)
    t2 = F.lit("2000-01-01 00:00:00").cast(_TS)
    dim = scd2_init(
        spark.createDataFrame([(1, "OLD"), (2, "X")], "k long, seg string")
        .withColumn("effective_at", t1),
        keys=["k"],
        attrs=["seg"],
    )
    return scd2_apply(
        dim,
        spark.createDataFrame([(1, "NEW")], "k long, seg string").withColumn(
            "effective_at", t2
        ),
        keys=["k"],
        attrs=["seg"],
    )


@pytest.fixture()
def dirs():
    ds = [tempfile.mkdtemp(prefix=f"scd_enrich_{i}_") for i in range(4)]
    yield ds
    for d in ds:
        shutil.rmtree(d, ignore_errors=True)


def _facts(spark):
    return spark.createDataFrame(
        [
            (10, 1, "1997-06-01 00:00:00"),  # inside OLD validity
            (11, 1, "2003-06-01 00:00:00"),  # inside NEW (open) validity
            (12, 2, "1994-01-01 00:00:00"),  # before any version -> NULL seg
            (13, 9, "2003-01-01 00:00:00"),  # unknown key -> NULL seg
        ],
        "fid long, k long, at string",
    ).withColumn("at", F.col("at").cast(_TS))


def test_stream_enrich_matches_batch_and_is_replay_idempotent(spark, dirs):
    src, ckpt1, ckpt2, wh = dirs
    dim_table = ParquetTable(spark, f"{wh}/dim")
    dim_table.overwrite_versioned(_dim_df(spark))
    sink = ParquetTable(spark, f"{wh}/enriched")

    facts = _facts(spark)
    facts.write.mode("append").parquet(src)
    stream = spark.readStream.schema(facts.schema).parquet(src)
    q = start_scd2_enrich(
        stream, dim_table, sink, keys=["k"], event_ts="at",
        fact_keys=["fid"], checkpoint_dir=ckpt1,
    )
    q.awaitTermination(120)

    got = {r["fid"]: r["seg"] for r in sink.read().collect()}
    assert got == {10: "OLD", 11: "NEW", 12: None, 13: None}
    # parity with the batch operator on the same inputs
    batch = {
        r["fid"]: r["seg"]
        for r in enrich_batch_asof(facts, dim_table.read(), ["k"], "at").collect()
    }
    assert batch == got

    # replay with a FRESH checkpoint re-reads every file; the dup-guarded
    # sink must not double-insert
    q2 = start_scd2_enrich(
        stream, dim_table, sink, keys=["k"], event_ts="at",
        fact_keys=["fid"], checkpoint_dir=ckpt2,
    )
    q2.awaitTermination(120)
    assert sink.read().count() == 4


def test_dimension_update_between_batches(spark, dirs):
    """A dimension version committed between micro-batches is visible to the
    NEXT batch (the per-batch snapshot read) — late facts about old times
    still label with the historically valid version."""
    src, ckpt, _unused, wh = dirs
    dim_table = ParquetTable(spark, f"{wh}/dim")
    dim_table.overwrite_versioned(_dim_df(spark))
    sink = ParquetTable(spark, f"{wh}/enriched")

    first = _facts(spark).filter(F.col("fid") == 10)
    first.write.mode("append").parquet(src)
    stream = spark.readStream.schema(first.schema).parquet(src)
    q = start_scd2_enrich(
        stream, dim_table, sink, keys=["k"], event_ts="at",
        fact_keys=["fid"], checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)

    # dimension evolves: k=1 re-labels from 2005 on; a late fact at 1997
    # must STILL see OLD, a 2007 fact sees the new version
    dim2 = scd2_apply(
        dim_table.read(),
        spark.createDataFrame([(1, "NEWER")], "k long, seg string").withColumn(
            "effective_at", F.lit("2005-01-01 00:00:00").cast(_TS)
        ),
        keys=["k"],
        attrs=["seg"],
    )
    dim_table.overwrite_versioned(dim2)

    late = spark.createDataFrame(
        [(20, 1, "1997-07-01 00:00:00"), (21, 1, "2007-01-01 00:00:00")],
        "fid long, k long, at string",
    ).withColumn("at", F.col("at").cast(_TS))
    late.write.mode("append").parquet(src)
    q2 = start_scd2_enrich(
        stream, dim_table, sink, keys=["k"], event_ts="at",
        fact_keys=["fid"], checkpoint_dir=ckpt,
    )
    q2.awaitTermination(120)

    got = {r["fid"]: r["seg"] for r in sink.read().collect()}
    assert got == {10: "OLD", 20: "OLD", 21: "NEWER"}


def test_payload_name_collision_prefixed(spark):
    """A dim attribute sharing a fact column's name lands as dim_<name>
    instead of producing a duplicate column that breaks the sink write."""
    dim = _dim_df(spark)
    facts = _facts(spark).withColumn("seg", F.lit("fact-side"))
    out = enrich_batch_asof(facts, dim, ["k"], "at")
    assert out.columns.count("seg") == 1
    row = {r["fid"]: r for r in out.collect()}
    assert row[10]["seg"] == "fact-side" and row[10]["dim_seg"] == "OLD"
