"""Pin the r13 prefix-difference window rewrites on ADVERSARIAL data.

``w_rolling_zscore`` and ``flagship_vertical_analytics`` compute their
sliding sums/counts as differences of incremental running prefixes
(guide §1.2: O(1)/row instead of O(frame)/row buffer re-evaluation). The
rewrite is exact only because of three guards the committed fixtures never
exercise (they contain no NULL values):

- a NULL-valued row contributes nothing to the prefix sums but still
  occupies frame positions;
- an all-NULL frame must yield NULL (SUM semantics), reproduced by the
  non-null-count guard — NOT 0 (the raw prefix difference);
- partitions shorter than the frame clamp via the coalesced lag/lead
  fallbacks (and the forward frames' partition-total tail).

This test runs both catalog queries against their DuckDB oracles (which
still state the plain sliding frames) on a synthetic events table built to
hit every guard: NULL runs at partition heads/tails, an all-NULL user, a
1-row user, and frames that straddle NULL gaps.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from schwab_elt_etl_pipeline_spark.testing.oracle import compare_to_oracle


def _synthetic_events(spark, tmp_path) -> str:
    rows = []
    eid = 0
    base = dt.datetime(2024, 3, 1, 0, 0, 0)

    def add(user, hours_offset, value):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(hours=hours_offset), user, "click", value, None)
        )

    # user 1: 50 hourly rows, NULLs sprinkled so frames straddle gaps
    for i in range(50):
        add(1, i, None if i % 7 in (2, 3) else float((i * 37) % 113) / 3.0)
    # user 2: single row (every frame shorter than its bounds)
    add(2, 0, 42.5)
    # user 3: ALL NULL values (all-NULL frames everywhere)
    for i in range(30):
        add(3, i * 2, None)  # 2-hour gaps: flagship's grid densifies between
    # user 4: NULL head (prefix sums start NULL), then values, then NULL tail
    for i in range(8):
        add(4, i, None)
    for i in range(8, 30):
        add(4, i, float(i) * 1.25)
    for i in range(30, 36):
        add(4, i, None)
    # user 5: exactly frame-sized series (20 rows) with one value repeated
    for i in range(20):
        add(5, i * 3, 7.0)

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string"
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_zscore_prefix_rewrite_matches_sliding_oracle_on_nulls(
    spark, tmp_path
):
    from schwab_elt_etl_pipeline_spark.catalog import all_specs

    sf_dir = _synthetic_events(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    spec = next(s for s in all_specs() if s.name == "w_rolling_zscore")
    res = compare_to_oracle(
        "w_rolling_zscore", spec.build(spark, sf_dir), spec.oracle, con
    )
    assert res.ok, res.detail


def test_flagship_prefix_rewrite_equals_sliding_form_on_nulls(
    spark, tmp_path
):
    """The shipped prefix-difference flagship must be BIT-IDENTICAL to the
    pre-r13 sliding-frame form on NULL-heavy inputs. (The DuckDB oracle
    itself diverges from BOTH forms on such inputs — a pre-existing edge
    outside the committed fixtures, which contain no NULL values — so the
    old Spark form is the reference here, not the oracle.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from schwab_elt_etl_pipeline_spark.catalog.domain import (
        flagship_vertical_analytics,
    )
    from schwab_elt_etl_pipeline_spark.functions.scalars import clamp
    from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf
    from schwab_elt_etl_pipeline_spark.sources import load_table

    sf_dir = _synthetic_events(spark, tmp_path)

    # the pre-r13 sliding-frame implementation, verbatim
    ev = load_table(spark, sf_dir, "events").repartition(4, "user_id")
    hourly = (
        ev.withColumn("h", F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz"))
        .groupBy("user_id", "h")
        .agg(F.max_by("value", F.struct("ts", "event_id")).alias("value"))
    )
    dense = gapfill_locf(
        hourly, entity=["user_id"], ts="h", values=["value"], step="interval 1 hour"
    )
    base = Window.partitionBy("user_id").orderBy("h")
    w_pre, w_fol = base.rowsBetween(-5, -1), base.rowsBetween(1, 5)
    vdec = F.col("value").cast("decimal(18,6)")
    flagged = dense.select(
        "user_id", "h", "value",
        F.sum(vdec).over(w_pre).alias("_sp"), F.count("value").over(w_pre).alias("_cp"),
        F.sum(vdec).over(w_fol).alias("_sf"), F.count("value").over(w_fol).alias("_cf"),
    )
    avg_pre = F.col("_sp").cast("double") / F.col("_cp")
    avg_fol = F.col("_sf").cast("double") / F.col("_cf")
    oi = F.when(
        (((avg_pre - F.col("value")) > 50) & ((avg_fol - F.col("value")) > 50))
        | (((F.col("value") - avg_pre) > 50) & ((F.col("value") - avg_fol) > 50)),
        1,
    ).otherwise(0)
    clean = (
        flagged.withColumn("OI", oi)
        .filter(F.col("OI") != 1)
        .withColumn("o", clamp(F.col("value"), 0.0, 100.0))
        .drop("_sp", "_cp", "_sf", "_cf")
    )
    w_roll = Window.partitionBy("user_id").orderBy("h").rowsBetween(-10, 0)
    rolled = clean.withColumn(
        "avg_r",
        F.sum(F.col("o").cast("decimal(18,6)")).over(w_roll).cast("double")
        / F.count("o").over(w_roll),
    )
    reference = rolled.groupBy("user_id", "h").agg(
        F.max("o").alias("o"), F.max("avg_r").alias("avg_r")
    )

    new = flagship_vertical_analytics(spark, sf_dir)
    cols = ["user_id", "h", "o", "avg_r"]
    old_rows = sorted(map(tuple, reference.select(*cols).collect()))
    new_rows = sorted(map(tuple, new.select(*cols).collect()))
    assert old_rows == new_rows
