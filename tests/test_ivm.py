"""Incremental view maintenance: after every CDF batch the maintained
denormalized view must equal the from-scratch join of the CURRENT base
tables — through fact inserts/updates/deletes AND dimension changes."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.operators.ivm import (
    apply_dim_delta,
    apply_fact_delta,
    build_join_view,
)
from schwab_elt_etl_pipeline_spark.sources import load_table
from schwab_elt_etl_pipeline_spark.sources.warehouse import ParquetTable


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="ivm_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _assert_view_equals_join(view, fact, dim, join_key):
    want = fact.join(dim, join_key)
    got = view.read().select(*want.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_fact_and_dim_deltas_keep_view_exact(spark, sf_dir, dirs):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )

    fact_t = ParquetTable(spark, dirs + "/fact")
    dim_t = ParquetTable(spark, dirs + "/dim")
    view_t = ParquetTable(spark, dirs + "/view")

    fact_v0 = fact_t.overwrite_versioned(orders)
    dim_v0 = dim_t.overwrite_versioned(cust)
    build_join_view(view_t, fact_t.read(), dim_t.read(), "o_custkey")
    _assert_view_equals_join(view_t, fact_t.read(), dim_t.read(), "o_custkey")

    # fact batch: delete a third, bump prices on another third, add new keys
    changed = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 1, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    ).filter(F.col("o_orderkey") % 3 != 0)
    new_rows = orders.filter(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000
    )
    fact_v1 = fact_t.overwrite_versioned(changed.unionByName(new_rows))
    delta = fact_t.diff(["o_orderkey"], fact_v0, fact_v1)
    assert {r["_change_type"] for r in delta.select("_change_type").distinct().collect()} == {
        "insert",
        "update",
        "delete",
    }
    apply_fact_delta(view_t, delta, dim_t.read(), ["o_orderkey"], "o_custkey")
    _assert_view_equals_join(view_t, fact_t.read(), dim_t.read(), "o_custkey")

    # dim batch: retag half the segments, drop a few customers entirely
    new_dim = (
        cust.withColumn(
            "c_mktsegment",
            F.when(F.col("o_custkey") % 2 == 0, F.lit("RETAGGED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
        .filter(F.col("o_custkey") % 17 != 0)
    )
    dim_v1 = dim_t.overwrite_versioned(new_dim)
    dim_delta = dim_t.diff(["o_custkey"], dim_v0, dim_v1)
    apply_dim_delta(view_t, dim_delta, fact_t.read(), dim_t.read(), "o_custkey")
    _assert_view_equals_join(view_t, fact_t.read(), dim_t.read(), "o_custkey")


def test_empty_delta_is_a_noop(spark, sf_dir, dirs):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    fact_t = ParquetTable(spark, dirs + "/fact")
    view_t = ParquetTable(spark, dirs + "/view")
    v0 = fact_t.overwrite_versioned(orders)
    v1 = fact_t.overwrite_versioned(orders)  # identical rewrite
    build_join_view(view_t, fact_t.read(), cust, "o_custkey")
    n = view_t.read().count()
    delta = fact_t.diff(["o_orderkey"], v0, v1)
    assert delta.count() == 0
    apply_fact_delta(view_t, delta, cust, ["o_orderkey"], "o_custkey")
    assert view_t.read().count() == n
