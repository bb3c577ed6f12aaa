"""Declarative data-quality rules.

The reference scatters its data-quality checks inside transforms — non-null /
zero-strike guards (docs/sql_server.md:216-222,271-274), market-hours
filters, outlier exclusion. This module lifts them into a declarative rule
set evaluated in ONE pass:

- ``dq_summary``: per-rule violation counts (conditional aggregation — one
  scan, no shuffle beyond the final 1-row aggregate).
- ``quarantine``: split rows into (clean, quarantined-with-reasons) with a
  single ``filter``/``array`` projection each — the split is two narrow
  passes over the same scan, both pushdown-friendly.

Rules are plain boolean Columns (True = row passes), so anything expressible
in Spark SQL is a rule; nothing here is row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dq_summary(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One row: total row count + per-rule violation counts.

    A NULL rule result counts as a violation (unknown is not a pass) —
    evaluate with null-safe expressions if NULLs are acceptable.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, rule in rules.items():
        aggs.append(
            F.sum(F.when(F.coalesce(rule, F.lit(False)), 0).otherwise(1)).alias(
                f"viol_{name}"
            )
        )
    return df.agg(*aggs)


def quarantine(
    df: DataFrame, rules: Mapping[str, Column], reasons_col: str = "_failed_rules"
) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantined). Quarantined rows carry the array of
    failed rule names, so downstream triage never re-evaluates the rules."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(rule, F.lit(False)), F.lit(name))
                for name, rule in rules.items()
            ]
        )
    )
    tagged = df.withColumn(reasons_col, failed)
    clean = tagged.filter(F.size(reasons_col) == 0).drop(reasons_col)
    bad = tagged.filter(F.size(reasons_col) > 0)
    return clean, bad
