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


def _rule_aggs(rules: Mapping[str, Column]) -> list[Column]:
    """The one definition of the DQ counter algebra (shared by the batch
    summary and the observe() path so they cannot diverge): total rows plus
    per-rule violation counts, a NULL rule result counting as a violation
    (unknown is not a pass)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, rule in rules.items():
        aggs.append(
            F.sum(F.when(F.coalesce(rule, F.lit(False)), 0).otherwise(1)).alias(
                f"viol_{name}"
            )
        )
    return aggs


def dq_summary(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One row: total row count + per-rule violation counts (see
    :func:`_rule_aggs` for the NULL rule-result convention)."""
    return df.agg(*_rule_aggs(rules))


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


def dq_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Set-level uniqueness check: one row ``(check_name, total, violations,
    passed)`` where violations = rows beyond the first per duplicate key.

    groupBy on the key then a 1-row aggregate — map-side combine keeps the
    shuffle at one row per distinct key, never a raw-row shuffle."""
    label = name or ("unique_" + "_".join(cols))
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
    return per_key.agg(
        F.lit(label).alias("check_name"),
        F.sum("_c").alias("total"),
        F.sum(F.col("_c") - 1).alias("violations"),
    ).select(
        "check_name", "total", "violations", (F.col("violations") == 0).alias("passed")
    )


def dq_foreign_key(
    df: DataFrame,
    cols: list[str],
    ref: DataFrame,
    ref_cols: list[str],
    name: str | None = None,
) -> DataFrame:
    """Referential-integrity check: violations = rows whose key has no match
    in ``ref`` (NULL keys are orphans too — unknown is not a pass).

    Left-anti join on the key; when the referenced dimension is small Spark
    broadcasts it (the usual case: facts validate against dimensions)."""
    label = name or ("fk_" + "_".join(cols))
    cond = [df[c] == ref[r] for c, r in zip(cols, ref_cols)]
    orphans = df.join(ref.select(*ref_cols), cond, "left_anti")
    total = df.agg(F.count(F.lit(1)).alias("total"))
    return (
        orphans.agg(F.count(F.lit(1)).alias("violations"))
        .crossJoin(total)  # two 1-row aggregates
        .select(
            F.lit(label).alias("check_name"),
            "total",
            "violations",
            (F.col("violations") == 0).alias("passed"),
        )
    )


def dq_report(
    df: DataFrame,
    rules: Mapping[str, Column] | None = None,
    unique: list[list[str]] | None = None,
    foreign_keys: list[tuple[list[str], DataFrame, list[str]]] | None = None,
) -> DataFrame:
    """Unified expectations report, long format: one row per check —
    ``(check_name, total, violations, passed)``.

    Row rules evaluate in ONE conditional-aggregation scan (then unpivot the
    1-row result — driver-free); each uniqueness / foreign-key check adds its
    own bounded aggregate. The union is a union of 1-row frames, so the
    report materializes in a single job regardless of check count.
    """
    parts: list[DataFrame] = []
    if rules:
        wide = dq_summary(df, rules)  # 1 row: n_rows + viol_* columns
        for rule_name in rules:
            parts.append(
                wide.select(
                    F.lit(rule_name).alias("check_name"),
                    F.col("n_rows").alias("total"),
                    F.col(f"viol_{rule_name}").alias("violations"),
                    (F.col(f"viol_{rule_name}") == 0).alias("passed"),
                )
            )
    for cols in unique or []:
        parts.append(dq_unique(df, cols))
    for cols, ref, ref_cols in foreign_keys or []:
        parts.append(dq_foreign_key(df, cols, ref, ref_cols))
    if not parts:
        raise ValueError("dq_report: no checks given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mad_drift(
    daily: DataFrame, keys: list[str], n_col: str = "n", k: float = 3.0
) -> DataFrame:
    """Robust drift flags over a per-(keys, period) count table: a row
    drifts when its count deviates from the key's median by more than
    ``k`` MADs (median absolute deviation — a few bad periods cannot drag
    the baseline the way mean/stddev would).

    ``daily`` is already collapsed (|keys|×|periods| rows), so the two
    percentile passes and the broadcast join-backs are free at any raw-data
    scale; the heavy lifting happened in whatever grouped count produced
    ``daily`` (one scan batch-side, or an incrementally maintained rollup
    stage stream-side — see ``streaming/rollup_stream.read_volume_drift``).
    """
    med = daily.groupBy(*keys).agg(
        F.expr(f"percentile({n_col}, 0.5)").alias("med")
    )
    with_med = daily.join(F.broadcast(med), list(keys))
    mad = with_med.groupBy(*keys).agg(
        F.expr(f"percentile(abs({n_col} - med), 0.5)").alias("mad")
    )
    return (
        with_med.join(F.broadcast(mad), list(keys))
        .select(
            *daily.columns,
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            (
                (F.col("mad") > 0)
                & (F.abs(F.col(n_col) - F.col("med")) > k * F.col("mad"))
            ).alias("is_drift"),
        )
    )


def observed_rules(
    df: DataFrame, rules: Mapping[str, Column], name: str = "dq"
):
    """Attach the rule counters to the NEXT ACTION on ``df`` — zero extra
    scans (``DataFrame.observe``; ``dq_summary`` semantics, but the metrics
    ride the write/collect the pipeline was going to run anyway).

    Returns ``(observed_df, observation)``; after any action on
    ``observed_df``, ``observation.get`` yields ``{"n_rows": ..., "viol_<rule>":
    ...}``. At 100 TB this is the difference between metered and unmetered
    pipelines: a separate ``dq_summary`` pass re-reads the table, while an
    observation is map-side accumulator work inside the job already paid for.

    The ``Observation``-object overload is BATCH-ONLY (Spark raises on a
    streaming frame), so for a streaming ``df`` this uses the string-name
    ``observe(name, *aggs)`` variant and returns ``observation=None`` — read
    the per-batch counters from ``StreamingQueryProgress.observedMetrics``
    under ``name`` instead (pair with ``streaming/monitor.py``'s listener to
    land them in the warehouse; ``tests/test_streaming.py`` shows the shape).

    NULL rule results count as violations, exactly as in :func:`dq_summary`.
    """
    from pyspark.sql import Observation

    if df.isStreaming:
        return df.observe(name, *_rule_aggs(rules)), None
    obs = Observation(name)
    return df.observe(obs, *_rule_aggs(rules)), obs
