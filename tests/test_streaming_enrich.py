"""Stream-stream time-band enrichment: streaming result must equal the same
expression run in batch, and the as-of reduction must pick the latest
underlying mark within the band."""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

from schwab_elt_etl_pipeline_spark.schemas import QUOTES_STREAM
from schwab_elt_etl_pipeline_spark.streaming.enrich import enrich_with_underlying

BASE = 1718634600000  # 2024-06-17 14:30:00 UTC


def _ms(minutes: float) -> int:
    return BASE + int(minutes * 60_000)


SYM = "SPXW  240621C05500000"

ROWS = [
    # $SPX marks at t=0, 1, 3 minutes
    (_ms(0), "$SPX", None, None, 5500.0, _ms(0)),
    (_ms(1), "$SPX", None, None, 5510.0, _ms(1)),
    (_ms(3), "$SPX", None, None, 5520.0, _ms(3)),
    # option ticks at t=1.5 (sees 0 and 1 -> latest 5510), t=3.5 (band covers
    # (1.5, 3.5]: only t=3 -> 5520), t=6 (band (4,6]: nothing -> dropped by
    # the inner join)
    (_ms(1.5), SYM, 10.0, _ms(1.5), None, None),
    (_ms(3.5), SYM, 11.0, _ms(3.5), None, None),
    (_ms(6), SYM, 12.0, _ms(6), None, None),
]

EXPECTED = {
    (10.0, 5510.0),
    (11.0, 5520.0),
}


@pytest.fixture()
def d():
    p = tempfile.mkdtemp(prefix="enrich_")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def test_batch_and_stream_agree(spark, d):
    batch = spark.createDataFrame(ROWS, QUOTES_STREAM)
    got_batch = {
        (r["mark"], r["spx"]) for r in enrich_with_underlying(batch).collect()
    }
    assert got_batch == EXPECTED

    # append mode only emits groups the watermark has closed, and the
    # watermark advances BETWEEN micro-batches — AND the global watermark is
    # the MIN across both join inputs, so stragglers must advance BOTH sides
    # (option and underlying). Two straggler files cover the one-batch
    # downstream-watermark lag of chained stateful operators (SPARK-40925).
    batch.coalesce(1).write.parquet(d + "/in")
    import time

    straggler_marks = set()
    for tmin in (30, 60):
        time.sleep(1.1)  # distinct mod-times keep file->batch order stable
        straggler_marks.add(90.0 + tmin)
        spark.createDataFrame(
            [
                (_ms(tmin), "$SPX", None, None, 5500.0, _ms(tmin)),
                (_ms(tmin), SYM, 90.0 + tmin, _ms(tmin), None, None),
            ],
            QUOTES_STREAM,
        ).coalesce(1).write.mode("append").parquet(d + "/in")
    q2 = (
        enrich_with_underlying(
            spark.readStream.schema(QUOTES_STREAM)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/in")
        )
        .writeStream.format("memory")
        .queryName("enriched2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got_stream = {
        (r["mark"], r["spx"]) for r in spark.sql("SELECT * FROM enriched2").collect()
    }
    # the original groups MUST have closed; straggler groups may or may not
    # have closed yet depending on the final watermark batch
    assert EXPECTED <= got_stream
    assert got_stream <= EXPECTED | {(m, 5500.0) for m in straggler_marks}
