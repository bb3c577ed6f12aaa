"""The conf-gated full-data pin (operators/pinning.py, r14 verdict #5).

Contract: ``spark.schwabEltEtl.pinSharedSubtrees=false`` removes the
localCheckpoint boundary from the shared-subtree operators (lineage intact,
no executor-pinned blocks) WITHOUT changing any output value; the default
keeps the pin (the r13-measured dedup win).
"""

from __future__ import annotations

import pytest

from schwab_elt_etl_pipeline_spark.operators.pinning import PIN_CONF
from schwab_elt_etl_pipeline_spark.operators.recurrence import linear_recurrence
from schwab_elt_etl_pipeline_spark.operators.smooth import ewma


@pytest.fixture
def pin_off(spark):
    spark.conf.set(PIN_CONF, "false")
    yield
    spark.conf.unset(PIN_CONF)


def _series_df(spark, n=150):
    # spark.range, not createDataFrame: local rows enter the plan as a
    # LogicalRDD, which would shadow exactly the pin-boundary node these
    # tests assert on. range -> projection keeps the unpinned plan RDD-free.
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") % 3).cast("int").alias("ent"),
        (F.col("id") / 3).cast("int").alias("t"),
        (F.sin(F.col("id") * 0.61) * 50 + (F.col("id") % 7)).alias("x"),
    )


def test_default_pins_ewma(spark):
    df = _series_df(spark)
    plan = ewma(df, "x", ["ent"], ["t"], 0.3)._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan


def test_opt_out_unpins_and_is_identical(spark, pin_off):
    df = _series_df(spark)
    out = ewma(df, "x", ["ent"], ["t"], 0.3)
    plan = out._jdf.queryExecution().toString()
    assert "ExistingRDD" not in plan and "LogicalRDD" not in plan
    got = {(r.ent, r.t): r.ewma for r in out.collect()}
    # recompute with the pin on (fresh build after the fixture's conf flips
    # back would race — set explicitly inside the test instead)
    spark.conf.set(PIN_CONF, "true")
    try:
        want = {
            (r.ent, r.t): r.ewma
            for r in ewma(df, "x", ["ent"], ["t"], 0.3).collect()
        }
    finally:
        spark.conf.set(PIN_CONF, "false")
    assert got == want  # bit-identical: same plan arithmetic either side


def test_opt_out_unpins_linear_recurrence(spark, pin_off):
    df = _series_df(spark, n=90)
    out = linear_recurrence(
        df,
        inputs=["x"],
        partition=["ent"],
        order=["t"],
        A=[[0.8, 0.1], [0.0, 0.9]],
        B=[[0.2], [0.1]],
    )
    plan = out._jdf.queryExecution().toString()
    assert "ExistingRDD" not in plan and "LogicalRDD" not in plan
    assert out.count() == 90
