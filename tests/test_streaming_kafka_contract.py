"""Kafka-branch contract parity WITHOUT a broker (none in the harness).

The kafka transport of ``read_quote_stream`` (SURVEY S3; reference websocket
feed services/schwab_stream.py:204-340) is swap-in-shaped: ``format("kafka")``
+ the shared ``parse_stream_json`` decode. These tests pin the two halves a
broker-less environment CAN verify:

1. the branch wires ``format("kafka")`` with the caller's options verbatim
   and applies exactly the same post-source decode lineage as the socket /
   json-files transports (one ``parse_stream_json`` — nothing kafka-special
   downstream), and
2. the decode itself is byte-parity on kafka's record shape: a BINARY
   ``value`` column (what the kafka source delivers) decodes to the identical
   ``QUOTES_STREAM`` rows as the STRING ``value`` the socket/text sources
   deliver, including the malformed-record poison-pill drop.

With both pinned, a real deployment only adds the spark-sql-kafka package;
no engine code changes.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
from schwab_elt_etl_pipeline_spark.streaming.quotes import (
    parse_stream_json,
    read_quote_stream,
)

_MSGS = [
    '{"received_at": 1718631600000, "symbol": "SPXW  240621C05500000",'
    ' "last_price": 20.5, "quote_time": 1718631600000,'
    ' "bid_price": 20.4, "ask_price": 20.6}',
    '{"received_at": 1718631601000, "symbol": "$SPX",'
    ' "last_price": 5500.0, "quote_time": 1718631601000}',
    "not json at all",  # poison pill: dropped, never poisons the batch
    '{"no_symbol": true}',  # valid JSON, no symbol: dropped
]


def _kafka_shaped(spark):
    """A frame with the kafka source's exact record schema (key/value BINARY
    plus provenance columns), carrying _MSGS as message values."""
    rows = [
        (None, m.encode("utf-8"), "quotes", 0, i, None, 0)
        for i, m in enumerate(_MSGS)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp, timestampType int",
    )


def test_kafka_value_decode_parity(spark):
    """BINARY kafka values decode to the identical QUOTES_STREAM rows as the
    STRING values the socket/text transports deliver."""
    from_kafka_shape = parse_stream_json(_kafka_shaped(spark)).collect()
    from_text_shape = parse_stream_json(
        spark.createDataFrame([(m,) for m in _MSGS], "value string")
    ).collect()
    assert from_kafka_shape == from_text_shape
    assert len(from_kafka_shape) == 2  # both malformed records dropped
    assert {r["symbol"] for r in from_kafka_shape} == {
        "SPXW  240621C05500000",
        "$SPX",
    }
    # full schema lands, absent fields NULL (same contract as parquet path)
    assert from_kafka_shape[0].asDict().keys() == {
        f.name for f in QUOTES_STREAM.fields
    }


class _RecordingReadStream:
    """Stands in for ``spark.readStream``: records format + options, serves a
    REAL streaming frame with kafka's record schema so the decode lineage
    downstream of the source is genuine (not a mock)."""

    def __init__(self, spark):
        self._spark = spark
        self.captured_format = None
        self.captured_options = {}

    def format(self, fmt):
        self.captured_format = fmt
        return self

    def options(self, **opts):
        self.captured_options.update(opts)
        return self

    def load(self):
        # rate source → kafka record shape: a genuine unbounded stream
        rate = self._spark.readStream.format("rate").option(
            "rowsPerSecond", "1"
        ).load()
        return rate.select(
            F.lit(None).cast("binary").alias("key"),
            F.encode(F.lit(_MSGS[0]), "utf-8").alias("value"),
            F.lit("quotes").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("value").alias("offset"),
            F.col("timestamp"),
            F.lit(0).alias("timestampType"),
        )


class _SparkWithRecorder:
    def __init__(self, spark, recorder):
        self._spark = spark
        self._recorder = recorder

    @property
    def readStream(self):
        return self._recorder

    def __getattr__(self, name):
        return getattr(self._spark, name)


def test_kafka_branch_options_and_plan_parity(spark):
    """The kafka branch passes the caller's options to ``format("kafka")``
    verbatim, and its post-source plan is EXACTLY the shared decode — the
    same ``parse_stream_json`` lineage the socket transport gets (pinned by
    comparing analyzed plans over the identical source frame)."""
    rec = _RecordingReadStream(spark)
    wrapped = _SparkWithRecorder(spark, rec)
    opts = {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "quotes",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "10000",
    }
    out = read_quote_stream(wrapped, fmt="kafka", options=opts)
    assert rec.captured_format == "kafka"
    assert rec.captured_options == opts
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        f.name for f in QUOTES_STREAM.fields
    ]

    # plan parity: the branch output over the recorded source frame equals
    # parse_stream_json applied to that same frame — no kafka-special shaping
    src = rec.load()
    want = parse_stream_json(src)
    got_plan = out._jdf.queryExecution().analyzed().toString()
    want_plan = want._jdf.queryExecution().analyzed().toString()

    def _normalize(p: str) -> str:
        import re

        # strip per-frame expression ids (#123) and stream ids
        return re.sub(r"#\d+[L]?", "#", re.sub(r"@[0-9a-f]+", "@", p))

    assert _normalize(got_plan) == _normalize(want_plan)
