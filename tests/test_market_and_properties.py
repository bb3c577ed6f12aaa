"""Market-hours plan tests + property tests (SURVEY §5.3): idempotence,
clamp bounds, key uniqueness, anti-join monotonicity."""

from __future__ import annotations

import pytest

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from schwab_elt_etl_pipeline_spark.plans.market import (
    next_session,
    upsert_market_hours,
)
from schwab_elt_etl_pipeline_spark.schemas import MARKET_HOURS


def _cal_rows():
    mk = lambda d, open_: (
        dt.datetime(2024, 6, 10, 3, 0),
        d,
        "EQUITY",
        "06:30:00",
        "13:00:00",
        open_,
    )
    return [
        mk(dt.date(2024, 6, 17), True),   # Monday
        mk(dt.date(2024, 6, 18), True),
        mk(dt.date(2024, 6, 19), False),  # holiday
        mk(dt.date(2024, 6, 20), True),
        mk(dt.date(2024, 6, 22), False),  # Saturday
    ]


def test_next_session_lookup(spark):
    cal = spark.createDataFrame(_cal_rows(), MARKET_HOURS)
    # mid-session on the 17th → the 17th still qualifies (not yet ended)
    r = next_session(cal, dt.datetime(2024, 6, 17, 10, 0)).first()
    assert r["market_date"] == dt.date(2024, 6, 17)
    # after close on the 18th → skips the closed 19th to the 20th
    r = next_session(cal, dt.datetime(2024, 6, 18, 14, 0)).first()
    assert r["market_date"] == dt.date(2024, 6, 20)
    # after the final open session → empty result, not an error
    assert next_session(cal, dt.datetime(2024, 6, 21, 0, 0)).count() == 0


def test_market_hours_merge_by_date(spark):
    cal = spark.createDataFrame(_cal_rows(), MARKET_HOURS)
    # re-snapshot of the 19th flips it open; new date appended
    snap = spark.createDataFrame(
        [
            (dt.datetime(2024, 6, 19, 3, 0), dt.date(2024, 6, 19), "EQUITY",
             "06:30:00", "13:00:00", True),
            (dt.datetime(2024, 6, 19, 3, 0), dt.date(2024, 6, 21), "EQUITY",
             "06:30:00", "13:00:00", True),
        ],
        MARKET_HOURS,
    )
    merged = upsert_market_hours(snap, cal)
    assert merged.count() == 6  # 5 dates + 1 new
    assert merged.filter(
        (F.col("market_date") == "2024-06-19") & F.col("is_open")
    ).count() == 1  # updated in place


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False), min_size=1, max_size=30
    ),
    width=st.integers(min_value=1, max_value=50),
)
def test_clamp_bounds_property(spark, values, width):
    from schwab_elt_etl_pipeline_spark.functions.scalars import clamp

    df = spark.createDataFrame([(v,) for v in values], ["x"])
    out = [r[0] for r in df.select(clamp(F.col("x"), 0.0, float(width))).collect()]
    assert all(0.0 <= v <= width for v in out)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=40),
)
def test_insert_new_idempotent_and_monotonic(spark, keys):
    from schwab_elt_etl_pipeline_spark.operators.merge import insert_new

    schema = "k long, v string"
    src = spark.createDataFrame([(k, f"v{k}") for k in keys], schema)
    # targets are unique-keyed by construction (the invariant insert_new
    # maintains; hypothesis correctly flagged that a dup-keyed target stays dup)
    target = spark.createDataFrame(
        [(k, f"t{k}") for k in keys[: len(keys) // 2]], schema
    ).dropDuplicates(["k"])

    new = insert_new(src, target, keys=["k"])
    merged = target.unionByName(new)
    # uniqueness: one row per key after merge
    assert merged.groupBy("k").count().filter("count > 1").count() == 0
    # idempotence: second pass adds nothing
    assert insert_new(src, merged, keys=["k"]).count() == 0
    # monotonicity: target rows never lost
    assert merged.count() >= target.count()


def test_surrogate_key_no_collisions(spark):
    from schwab_elt_etl_pipeline_spark.operators.merge import surrogate_key

    df = spark.range(200_000).select(
        (F.col("id") % 997).alias("a"), (F.col("id") / 997).cast("int").alias("b")
    )
    keys = df.select(surrogate_key("a", "b").alias("sk"))
    assert keys.distinct().count() == df.distinct().count()


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    obs=st.dictionaries(
        st.integers(min_value=1, max_value=3),  # entity id
        st.dictionaries(
            st.integers(min_value=0, max_value=30),  # minute offset
            st.floats(min_value=0, max_value=100, allow_nan=False, width=32),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
def test_gapfill_locf_properties(spark, obs):
    """T9 invariants for arbitrary sparse series: dense minute grid from each
    entity's first to last observation; LOCF equals the latest observation at
    or before each grid point; observed points keep their exact value."""
    import datetime as dt

    from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf

    base = dt.datetime(2024, 6, 17, 9, 0)
    rows = [
        (e, base + dt.timedelta(minutes=m), float(v))
        for e, series in obs.items()
        for m, v in series.items()
    ]
    df = spark.createDataFrame(rows, "entity int, t timestamp_ntz, v double")
    out = gapfill_locf(df, entity=["entity"], ts="t", values=["v"], step="interval 1 minute")
    got = {}
    for r in out.collect():
        got.setdefault(r["entity"], {})[r["t"]] = r["v"]

    for e, series in obs.items():
        lo, hi = min(series), max(series)
        grid = got[e]
        # dense grid, exactly first..last observation
        assert len(grid) == hi - lo + 1
        carried = None
        for m in range(lo, hi + 1):
            t = base + dt.timedelta(minutes=m)
            if m in series:
                carried = float(series[m])
            assert grid[t] == carried  # LOCF


def test_gapfill_locf_off_grid_observations(spark):
    """Observations NOT aligned to the grid step must still be carried
    forward (as-of semantics) — an equality join against the grid would
    silently drop them and LOCF pure nulls (the real OPTM path has
    second-precision quote times on a minute grid)."""
    import datetime as dt

    from schwab_elt_etl_pipeline_spark.operators.gapfill import gapfill_locf

    base = dt.datetime(2024, 6, 17, 6, 30)
    rows = [
        # entity 1: ticks at 06:30:15, 06:31:40, 06:33:05 — none on :00
        (1, base + dt.timedelta(seconds=15), 10.0),
        (1, base + dt.timedelta(minutes=1, seconds=40), 11.0),
        (1, base + dt.timedelta(minutes=3, seconds=5), 12.0),
    ]
    df = spark.createDataFrame(rows, "entity int, t timestamp_ntz, v double")
    out = gapfill_locf(
        df,
        entity=["entity"],
        ts="t",
        values=["v"],
        step="interval 1 minute",
        grid_start="date_trunc('minute', _min_ts)",
        grid_end="timestamp_ntz'2024-06-17 06:34:00'",
    )
    got = {r["t"]: r["v"] for r in out.collect()}
    expect = {
        base + dt.timedelta(minutes=0): None,   # grid point before first tick
        base + dt.timedelta(minutes=1): 10.0,   # 06:30:15 carried to 06:31
        base + dt.timedelta(minutes=2): 11.0,   # 06:31:40 carried to 06:32
        base + dt.timedelta(minutes=3): 11.0,   # 06:33:05 is after 06:33
        base + dt.timedelta(minutes=4): 12.0,
    }
    assert got == expect


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    tgt_keys=st.lists(st.integers(min_value=0, max_value=12), min_size=0, max_size=15, unique=True),
    src=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),   # key
            st.booleans(),                             # delete tombstone
        ),
        min_size=0, max_size=15,
        unique_by=lambda t: t[0],
    ),
)
@pytest.mark.slow  # r13 verdict #2 re-tier: >=9 s property/reference test; close-gate full suite still runs it
def test_merge_full_matches_reference_model(spark, tgt_keys, src):
    """merge_full vs a dict-based reference MERGE: update on match, delete on
    tombstone, insert on no-match (tombstoned non-matches dropped)."""
    from schwab_elt_etl_pipeline_spark.operators.merge import merge_full

    schema = "k long, v string, del boolean"
    target = spark.createDataFrame([(k, f"t{k}", False) for k in tgt_keys], schema)
    source = spark.createDataFrame([(k, f"s{k}", d) for k, d in src], schema)

    expected = {k: f"t{k}" for k in tgt_keys}
    for k, d in src:
        if d:
            expected.pop(k, None)          # matched → delete; unmatched → skip
        else:
            expected[k] = f"s{k}"          # matched → update; unmatched → insert

    out = merge_full(source, target, keys=["k"], delete_condition=F.col("del"))
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == expected
