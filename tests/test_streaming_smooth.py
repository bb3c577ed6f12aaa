"""Stream ≡ batch parity for the stateful smoothing twin
(streaming/smooth_stream.py vs operators/smooth.py / operators/recurrence.py).

A time-ordered corpus split across micro-batches must yield row-for-row the
same EWMA / Holt states as the batch chunked scan over the union — the same
replay contract the incremental dedup/ANN indexes pin in
test_streaming_corpus.py. State lives in the state store, so the recurrence
must survive the batch boundary (keys B and C straddle it deliberately).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

from schwab_elt_etl_pipeline_spark.operators.recurrence import linear_recurrence
from schwab_elt_etl_pipeline_spark.operators.smooth import ewma
from schwab_elt_etl_pipeline_spark.streaming.smooth_stream import (
    ewma_stream,
    recurrence_stream,
)

SCHEMA = "ent string, t int, x double"

# batch 1 rows all precede batch 2 rows per key (the replay contract);
# C appears only in batch 2, A only in batch 1, B straddles; one null.
BATCH1 = [
    ("A", 0, 10.0), ("A", 1, 12.0), ("A", 2, 8.0),
    ("B", 0, 100.0), ("B", 1, None), ("B", 2, 90.0),
]
BATCH2 = [
    ("B", 3, 95.0), ("B", 4, 80.0),
    ("C", 0, 7.0), ("C", 1, 9.0),
]


def _run_stream(spark, build):
    src = tempfile.mkdtemp(prefix="sm_src_")
    ckpt = tempfile.mkdtemp(prefix="sm_ck_")
    name = f"sm_out_{abs(hash(ckpt)) % 10**8}"
    try:
        for batch in (BATCH1, BATCH2):
            (
                spark.createDataFrame(batch, SCHEMA)
                .coalesce(1)
                .write.mode("append")
                .parquet(src)
            )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        for d in (src, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_ewma_stream_matches_batch(spark):
    rows = _run_stream(
        spark, lambda s: ewma_stream(s, "x", ["ent"], ["t"], alpha=0.3)
    )
    batch_df = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    want = {
        (r.ent, r.t): r.ewma
        for r in ewma(batch_df, "x", ["ent"], ["t"], 0.3, chunk_rows=2).collect()
    }
    assert len(rows) == len(want)
    for r in rows:
        assert r.ewma == pytest.approx(want[(r.ent, r.t)], rel=1e-12), (r.ent, r.t)


def test_recurrence_stream_matches_batch_holt(spark):
    holt = {
        "A": [[0.6, 0.6], [-0.12, 0.88]],
        "B": [[0.4], [0.12]],
        "init": [[1.0], [0.0]],
    }
    rows = _run_stream(
        spark,
        lambda s: recurrence_stream(
            s, ["x"], ["ent"], ["t"], outs=["lvl", "trend"], **holt
        ),
    )
    batch_df = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    got_batch = linear_recurrence(
        batch_df, ["x"], ["ent"], ["t"],
        outs=["lvl", "trend"], chunk_rows=2, **holt,
    ).collect()
    want = {(r.ent, r.t): (r.lvl, r.trend) for r in got_batch}
    assert len(rows) == len(want)
    for r in rows:
        wl, wt = want[(r.ent, r.t)]
        assert r.lvl == pytest.approx(wl, rel=1e-12), (r.ent, r.t)
        assert r.trend == pytest.approx(wt, rel=1e-12), (r.ent, r.t)


def test_cusum_stream_matches_prefix_identity(spark):
    """The streaming clamp recurrence must equal the batch prefix-min
    identity S_t = P_t - min(0, min P_i) — the w_cusum_shift construction —
    cross-certifying the identity against sequential execution."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    from schwab_elt_etl_pipeline_spark.streaming.smooth_stream import cusum_stream

    target = 9.0
    rows = _run_stream(
        spark, lambda s: cusum_stream(s, "x", ["ent"], ["t"], target=target)
    )

    batch_df = spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
    w = (
        Window.partitionBy("ent")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = batch_df.select(
        "ent", "t", F.sum(F.col("x") - target).over(w).alias("_p")
    )
    ident = run.select(
        "ent",
        "t",
        (
            F.col("_p")
            - F.least(F.lit(0.0), F.min("_p").over(w))
        ).alias("cusum"),
    )
    want = {(r.ent, r.t): r.cusum for r in ident.collect()}

    # sequential ground truth, null leaves state untouched
    seq = {}
    st = {}
    for ent, t, x in BATCH1 + BATCH2:
        s = st.get(ent, 0.0)
        if x is not None:
            s = max(0.0, s + (x - target))
        st[ent] = s
        seq[(ent, t)] = s

    assert len(rows) == len(want) == len(seq)
    for r in rows:
        assert r.cusum == pytest.approx(seq[(r.ent, r.t)], abs=1e-9), (r.ent, r.t)
        assert r.cusum == pytest.approx(want[(r.ent, r.t)], abs=1e-9), (r.ent, r.t)


def test_stream_validation():
    with pytest.raises(ValueError):
        ewma_stream(None, "x", ["e"], ["t"], alpha=0.0)
    with pytest.raises(ValueError):
        recurrence_stream(None, ["x"], ["e"], ["t"], A=[[1.0, 0.0]], B=[[1.0]])
