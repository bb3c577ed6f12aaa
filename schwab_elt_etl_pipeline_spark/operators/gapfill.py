"""Gap-fill / LOCF densification (SURVEY T9).

The reference's ``SP_OPTION_TIMESERIES_BACKFILL`` is invoked but its body is
absent from the repo (docs/sql_server.md:443-450: "Fills gaps between price
updates … essential for accurate multi-leg pricing"). SURVEY T9 pins its
semantics: a dense per-entity time grid with last-observation-carried-forward.

Spark-first shape:
  1. per entity, ``sequence(min_t, max_t, step)`` + ``explode`` builds the grid
     (distributed — no driver loop);
  2. union observations with the grid rows (no join needed);
  3. ``last(value, ignoreNulls=True)`` over an unbounded-preceding row frame
     ordered by (ts, is_grid) carries values forward, then only grid rows are
     kept — so each grid point gets the latest observation at-or-before it
     (as-of semantics), even when observations are NOT aligned to grid
     timestamps (e.g. second-precision ticks on a minute grid).

Scale notes: the grid explode multiplies rows by (span/step) — at 100 TB keep
the grid bounded per entity (the reference bounds it to one session,
@MinTime..13:00). The union is shuffle-free; the single LOCF window shuffles
once on the entity key — one exchange for the whole operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gapfill_locf(
    df: DataFrame,
    entity: Sequence[str],
    ts: str,
    values: Sequence[str],
    step: str = "interval 1 minute",
    grid_start: str | None = None,
    grid_end: str | None = None,
) -> DataFrame:
    """Densify ``df`` to a regular time grid per entity and LOCF-fill ``values``.

    ``grid_start``/``grid_end`` are SQL expressions evaluated per entity with
    ``_min_ts``/``_max_ts`` in scope (default: the entity's observed min/max of
    ``ts``). The grid starts exactly at the start expression; pass a truncated
    expression (e.g. ``date_trunc('minute', _min_ts)``) to align to step
    boundaries.

    Each grid point carries the latest observation at-or-before it: an
    observation exactly on a grid timestamp is taken as-is, one between grid
    points is carried forward to the next point (observations are NOT required
    to be grid-aligned). Observations before ``grid_start`` seed the fill;
    observations after ``grid_end`` are ignored.
    """
    unioned = _grid_union(df, entity, ts, values, step, grid_start, grid_end)
    entity_cols = [F.col(c) for c in entity]
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(ts, "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        unioned.select(
            *entity_cols,
            F.col(ts),
            F.col("_is_grid"),
            *[F.last(v, ignorenulls=True).over(w).alias(v) for v in values],
        )
        .filter(F.col("_is_grid") == 1)
        .drop("_is_grid")
    )
    return filled


def gapfill_interpolate(
    df: DataFrame,
    entity: Sequence[str],
    ts: str,
    values: Sequence[str],
    step: str = "interval 1 minute",
    grid_start: str | None = None,
    grid_end: str | None = None,
) -> DataFrame:
    """Densify ``df`` to a regular grid and LINEARLY interpolate ``values``.

    The LOCF sibling answers "what was the latest known value"; this one
    answers "what was the value, assuming it moved linearly between
    observations" — the shape the reference's timeseries backfill docs call
    "accurate multi-leg pricing" interpolation (docs/sql_server.md:443-450).

    Per grid point: the surrounding non-NULL observations bracket it and the
    value is ``prev + (next - prev) * Δt_elapsed / Δt_span`` with Δt in whole
    seconds (an exact integer ratio, so the single IEEE multiply-add is
    bit-reproducible across engines). Before the first observation the next
    value is used (NOCB), after the last the previous carries forward (LOCF);
    observations with NULL values are transparent, exactly as in LOCF.

    Same scale shape as LOCF: the grid explode fans out pre-partitioned, then
    ONE entity-keyed exchange serves both window directions. The forward
    ("next observation") trackers deliberately AVOID a
    ``rowsBetween(0, unboundedFollowing)`` frame: Spark's
    UnboundedFollowingWindowFunctionFrame re-scans current-row→partition-end
    for every row — O(rows²) per entity partition — while ``last(...,
    ignorenulls)`` over a DESCENDING running frame is the same value in O(rows)
    (measured 4.6× on the hourly-grid catalog query; outputs bit-identical).
    The reversed window reuses the entity exchange and only adds a second
    in-partition sort.
    """
    unioned = _grid_union(df, entity, ts, values, step, grid_start, grid_end)
    entity_cols = [F.col(c) for c in entity]
    wb = (
        Window.partitionBy(*entity_cols)
        .orderBy(ts, "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*entity_cols)
        .orderBy(F.col(ts).desc(), F.col("_is_grid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Track (timestamp, value) of the bracketing NON-NULL observations. An
    # observation exactly on a grid timestamp sorts BEFORE its grid row
    # ((ts, _is_grid) order), so it lands in the backward frame — the grid
    # row reproduces it exactly (elapsed = 0). NULL-valued observations are
    # excluded from BOTH the timestamp and value trackers so (pt, pv) stay a
    # consistent pair. ``last`` over the descending running frame ``wf`` ==
    # "first at-or-after in ascending order": the frame holds rows with
    # (ts, _is_grid) >= the current row's, and ``last`` picks the one
    # nearest the current row.
    out = unioned.select(
        *entity_cols,
        F.col(ts),
        F.col("_is_grid"),
        *[c for v in values for c in (
            F.last(
                F.when((F.col("_is_grid") == 0) & F.col(v).isNotNull(), F.col(ts)),
                ignorenulls=True,
            ).over(wb).alias(f"__pt_{v}"),
            F.last(F.when(F.col("_is_grid") == 0, F.col(v)), ignorenulls=True)
            .over(wb).alias(f"__pv_{v}"),
            F.last(
                F.when((F.col("_is_grid") == 0) & F.col(v).isNotNull(), F.col(ts)),
                ignorenulls=True,
            ).over(wf).alias(f"__nt_{v}"),
            F.last(F.when(F.col("_is_grid") == 0, F.col(v)), ignorenulls=True)
            .over(wf).alias(f"__nv_{v}"),
        )],
    )
    for v in values:
        pt, pv = F.col(f"__pt_{v}"), F.col(f"__pv_{v}")
        nt, nv = F.col(f"__nt_{v}"), F.col(f"__nv_{v}")
        frac = (
            F.expr(f"timestampdiff(SECOND, __pt_{v}, {ts})")
            / F.expr(f"timestampdiff(SECOND, __pt_{v}, __nt_{v})")
        )
        out = out.withColumn(
            v,
            F.when(pt.isNull(), nv)
            .when(nt.isNull(), pv)
            .otherwise(pv + (nv - pv) * frac),
        )
    return (
        out.filter(F.col("_is_grid") == 1)
        .select(*entity_cols, F.col(ts), *[F.col(v) for v in values])
    )


def _grid_union(
    df: DataFrame,
    entity: Sequence[str],
    ts: str,
    values: Sequence[str],
    step: str,
    grid_start: str | None,
    grid_end: str | None,
) -> DataFrame:
    """Observations ∪ dense grid rows, tagged ``_is_grid`` (0 = observation).

    Shared by LOCF and linear interpolation — both fill by windowing over
    this union ordered by ``(ts, _is_grid)``.
    """
    entity_cols = [F.col(c) for c in entity]

    bounds = df.groupBy(*entity_cols).agg(
        F.min(ts).alias("_min_ts"), F.max(ts).alias("_max_ts")
    )
    start_expr = F.expr(grid_start) if grid_start else F.col("_min_ts")
    end_expr = F.expr(grid_end) if grid_end else F.col("_max_ts")

    # Re-spread bounds across entity hash partitions BEFORE the explode: AQE
    # coalesces the tiny bounds aggregate to few partitions, and exploding the
    # grid (rows × span/step) inside them serializes the fan-out. The explicit
    # partition count is required — an expression-only repartition is itself
    # AQE-coalesced by byte size, which is misleading ahead of a row explosion.
    # Hashing by entity also pre-satisfies the join/window distributions below.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    grid = bounds.repartition(n_part, *entity_cols).select(
        *entity_cols,
        F.explode(F.sequence(start_expr, end_expr, F.expr(step))).alias(ts),
    )

    # Union observations with grid rows; the fill is one window pass in the
    # caller. Ordering by (ts, _is_grid) puts an observation at exactly a grid
    # timestamp BEFORE that grid row, so the grid row picks it up; off-grid
    # observations land between grid rows and carry to the next one (as-of
    # semantics). An equality join would silently drop every non-aligned
    # observation.
    value_types = dict(df.dtypes)
    obs = df.select(
        *entity_cols,
        F.col(ts),
        F.lit(0).alias("_is_grid"),
        *[F.col(v) for v in values],
    )
    grid_rows = grid.select(
        *entity_cols,
        F.col(ts),
        F.lit(1).alias("_is_grid"),
        *[F.lit(None).cast(value_types[v]).alias(v) for v in values],
    )
    return obs.unionByName(grid_rows)
