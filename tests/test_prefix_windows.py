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


# (r14) The flagship prefix-difference equivalence test was removed along
# with the rewrite it pinned: measured A/Bs showed the prefix+lag/lead form
# LOSES to the plain sliding buffer at the flagship's 5/11-row frames, at
# both 1x and the 10x replica, so domain.py reverted to the sliding form
# (which needs no equivalence pin — it IS the oracle's form).
# w_rolling_zscore keeps its rewrite (20-row frame, driver-measured 1.99x);
# the tests below still pin it on adversarial NULLs and on the documented
# overflow bound.


def test_prefix_overflow_ansi(spark, tmp_path):
    """The documented exactness bound of the prefix rewrite (r13 advice):
    the squared-value prefix _p2 is decimal(38,12) accumulated over the
    WHOLE partition, so a user whose SUM(value^2) exceeds 1e26 overflows it
    where the old 20-row sliding sum could not. Contract: within the
    documented magnitude bound the query is exact (first case); past it,
    ANSI mode surfaces the overflow as an ERROR rather than the silent
    NULL z-scores non-ANSI mode would produce (second case)."""
    import datetime as dt2

    from pyspark.sql import functions as F

    from schwab_elt_etl_pipeline_spark.catalog import all_specs

    spec = next(s for s in all_specs() if s.name == "w_rolling_zscore")
    base = dt2.datetime(2024, 3, 1)

    def write_events(value: float, n: int, path):
        df = spark.range(n).select(
            (F.col("id") + 1).alias("event_id"),
            (F.lit(base) + F.make_interval(hours=F.col("id"))).cast(
                "timestamp_ntz"
            ).alias("ts"),
            F.lit(1).cast("long").alias("user_id"),
            F.lit("click").alias("event_type"),
            (F.lit(value) + F.col("id")).alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(path / "events.parquet"))
        return str(path)

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        # within the bound: 2,000 rows of |value| ~ 1e6 -> SUM(v^2) ~ 2e15,
        # 11 orders inside the 1e26 budget; ANSI runs clean, values sane
        ok_dir = write_events(1.0e6, 2_000, tmp_path)
        rows = spec.build(spark, ok_dir).collect()
        assert len(rows) == 2_000
        assert all(r.roll_mean is not None for r in rows)

        # past the bound: 12,000 rows of value ~ 1e11 -> SUM(v^2) ~ 1.2e26
        # overflows decimal(38,12); ANSI must raise, not NULL the scores
        bad_dir = write_events(1.0e11, 12_000, tmp_path)
        with pytest.raises(Exception) as exc:
            spec.build(spark, bad_dir).collect()
        msg = str(exc.value)
        assert (
            "NUMERIC_VALUE_OUT_OF_RANGE" in msg
            or "overflow" in msg.lower()
            or "Arithmetic" in msg
        ), msg
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")
