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

    # Union observations with grid rows and LOCF in one window pass. Ordering
    # by (ts, _is_grid) puts an observation at exactly a grid timestamp BEFORE
    # that grid row, so the grid row picks it up; off-grid observations land
    # between grid rows and carry forward to the next one (as-of semantics).
    # An equality join would silently drop every non-aligned observation.
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
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(ts, "_is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        obs.unionByName(grid_rows)
        .select(
            *entity_cols,
            F.col(ts),
            F.col("_is_grid"),
            *[F.last(v, ignorenulls=True).over(w).alias(v) for v in values],
        )
        .filter(F.col("_is_grid") == 1)
        .drop("_is_grid")
    )
    return filled
