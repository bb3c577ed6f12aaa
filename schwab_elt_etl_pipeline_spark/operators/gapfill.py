"""Gap-fill / LOCF densification (SURVEY T9).

The reference's ``SP_OPTION_TIMESERIES_BACKFILL`` is invoked but its body is
absent from the repo (docs/sql_server.md:443-450: "Fills gaps between price
updates … essential for accurate multi-leg pricing"). SURVEY T9 pins its
semantics: a dense per-entity time grid with last-observation-carried-forward.

Spark-first shape:
  1. per entity, ``sequence(min_t, max_t, step)`` + ``explode`` builds the grid
     (distributed — no driver loop);
  2. left join observations onto the grid;
  3. ``last(value, ignoreNulls=True)`` over an unbounded-preceding row frame
     carries values forward.

Scale notes: the grid explode multiplies rows by (span/step) — at 100 TB keep
the grid bounded per entity (the reference bounds it to one session,
@MinTime..13:00). The window shuffles once on the entity key; the preceding
join reuses the same partitioning, so AQE plans one exchange.
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

    joined = grid.join(df, on=[*entity, ts], how="left")
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        *entity_cols,
        F.col(ts),
        *[F.last(v, ignorenulls=True).over(w).alias(v) for v in values],
    )
    return filled
