"""Query catalog — the engine's public query surface.

Every operator in SURVEY §2 (plus the LLM-data-pipeline family) is exposed as a
named query spec: a DataFrame builder over the benchmark tables and, where the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string for
differential correctness testing (SURVEY §5.1).

Hash-match conventions (the driver compares row counts, column names, and an
order-insensitive value hash — see repo ``__spark_entry__.py``):

- Monetary aggregates go through ``DECIMAL(18,4)`` so sums are exact and
  engine-order-independent, then cast to DOUBLE for a type-stable output.
- Averages are computed as ``CAST(exact_decimal_sum AS DOUBLE) / count`` — a
  single deterministic IEEE division, bit-identical across engines.
- No raw DECIMAL columns in outputs (Decimal vs float hash differently).
- Window/top-k orderings always carry a unique tiebreaker column.
- Every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry.

    ``oracle`` is ANSI SQL runnable by DuckDB against views named after the
    benchmark tables; ``None`` marks a genuinely non-SQL-expressible operator
    (driver then records a weaker rows-only check).
    ``headline`` selects the query for ``bench.py``.
    """

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    doc: str = ""


def all_specs() -> list[QuerySpec]:
    """Assemble the full registry (import here to keep module load light)."""
    from schwab_elt_etl_pipeline_spark.catalog import (
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        curation2,
        domain,
        domain_pipeline,
        llm_text,
        multimodal_q,
        operators_demo,
        resolution,
        similarity,
    )

    # Registry order matters: the driver's correctness gate checks the FIRST
    # 50 queries per round. Rounds 1+2 together verified every then-existing
    # query (round-1 analytics/operators families; round-2 domain/LLM/
    # similarity/analytics-wave-3). Round 3 front-loads the NEW curation2
    # family, then the families verified longest ago (round-1 set) for
    # re-confirmation; the round-2-verified set goes last.
    specs: list[QuerySpec] = []
    for mod in (
        curation2,
        analytics5,
        analytics,
        analytics2,
        analytics3,
        operators_demo,
        domain,
        domain_pipeline,
        llm_text,
        similarity,
        analytics4,
        multimodal_q,
        resolution,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in catalog"
    return specs


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.build for s in all_specs()}


def oracle_sql() -> dict[str, str]:
    return {s.name: s.oracle for s in all_specs() if s.oracle is not None}
