"""Real JDBC round-trip against embedded Derby (the driver Spark bundles):
write → read parity, partition-parallel reads, and S6 dup-guarded insert
idempotence — the reference's SQL-database sink semantics, executed."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.jdbc import (
    derby_url,
    insert_new_jdbc,
    read_jdbc,
    write_jdbc,
)


@pytest.fixture()
def url():
    d = tempfile.mkdtemp(prefix="jdbc_")
    yield derby_url(d)
    shutil.rmtree(d, ignore_errors=True)


def test_roundtrip_values_and_types(spark, sf_dir, url):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    write_jdbc(orders, url, "orders_t", mode="overwrite")
    back = read_jdbc(spark, url, "orders_t")
    assert back.count() == orders.count()
    want = orders.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
    ).first()[0]
    got = back.agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
    ).first()[0]
    assert got == want
    assert back.filter(F.col("o_orderstatus").isNull()).count() == 0


def test_partitioned_read_fans_out(spark, sf_dir, url):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    write_jdbc(orders, url, "orders_p", mode="overwrite")
    hi = orders.agg(F.max("o_orderkey")).first()[0]
    back = read_jdbc(
        spark,
        url,
        "orders_p",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=int(hi) + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()


def test_insert_new_is_replay_idempotent(spark, sf_dir, url):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    insert_new_jdbc(first, url, "orders_i", keys=["o_orderkey"])
    n1 = read_jdbc(spark, url, "orders_i").count()
    assert n1 == first.count()

    # replay the same batch: zero new rows
    insert_new_jdbc(first, url, "orders_i", keys=["o_orderkey"])
    assert read_jdbc(spark, url, "orders_i").count() == n1

    # overlapping batch: only the genuinely new keys land
    insert_new_jdbc(orders, url, "orders_i", keys=["o_orderkey"])
    assert read_jdbc(spark, url, "orders_i").count() == orders.count()


def test_streaming_jdbc_sink_exactly_once_effective(spark, sf_dir, url):
    """Stream events into Derby across micro-batches; a full replay from a
    fresh checkpoint (at-least-once delivery, worst case) must add zero
    rows — exactly-once EFFECTS via the key-guarded insert."""
    import tempfile

    from schwab_elt_etl_pipeline_spark.streaming.jdbc_sink import (
        write_stream_jdbc,
    )

    d = tempfile.mkdtemp(prefix="jstream_")
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.withColumn("_f", F.col("event_id") % 3).repartition("_f").write.partitionBy(
        "_f"
    ).parquet(d + "/in")
    schema = ev.withColumn("_f", F.col("event_id") % 3).schema

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/in")
            .drop("_f")
        )
        q = write_stream_jdbc(
            stream, url, "events_j", keys=["event_id"], checkpoint_dir=ckpt
        )
        q.awaitTermination(120)

    run(d + "/ckpt1")
    n = read_jdbc(spark, url, "events_j").count()
    assert n == ev.count()

    run(d + "/ckpt2")  # full replay, fresh checkpoint
    assert read_jdbc(spark, url, "events_j").count() == n
