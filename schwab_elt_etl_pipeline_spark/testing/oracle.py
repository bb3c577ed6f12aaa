"""DuckDB-as-oracle differential comparator (SURVEY §5.1).

Mirrors the driver's correctness gate: run the Spark query and the oracle SQL
on the same parquet tables, then compare row count, column-name set, and an
order-insensitive canonical form of all values. Canonicalization matches what
a value-hash would see: rows sorted by their stringified form with columns in
name order.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from schwab_elt_etl_pipeline_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with each benchmark table registered as a view (the driver
    pre-registers the same views)."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_value(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr keeps full precision; hash-equality requires bit-equality
        return repr(v)
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str

    def __str__(self) -> str:
        return f"{'PASS' if self.ok else 'FAIL'} {self.name}: {self.detail}"


def _dtype_class(dtype: Any) -> str:
    """Collapse a pandas dtype into {int, float, other} — the classes whose
    cross-engine disagreement changes a stringified value hash (1864 vs
    1864.0). DuckDB's SUM(int)→HUGEINT lands as float64 in pandas while
    Spark's stays int64; the driver's hash sees that as a mismatch even when
    every value is numerically equal."""
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    return "other"


def compare_to_oracle(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
    max_mismatches_shown: int = 5,
) -> CompareResult:
    # Values compare as Python objects (collect/fetchall) — DATE stays
    # datetime.date on both engines. The pandas dtype-class check below is
    # separate: it catches int-vs-float divergence (DuckDB SUM(int)→HUGEINT
    # →float64) that object equality hides but the driver's hash sees.
    actual_cols = spark_df.columns
    actual_pdf = spark_df.toPandas()
    actual_rows = [tuple(r) for r in spark_df.collect()]

    cur = con.execute(oracle_sql)
    expected_cols = [d[0] for d in cur.description]
    expected_rows = cur.fetchall()
    expected_pdf = con.execute(oracle_sql).df()

    for col in actual_cols:
        if col not in expected_pdf.columns:
            continue
        ac = _dtype_class(actual_pdf[col].dtype)
        ec = _dtype_class(expected_pdf[col].dtype)
        if ac != ec:
            return CompareResult(
                name,
                False,
                f"dtype class differs on {col!r}: spark={actual_pdf[col].dtype} "
                f"duckdb={expected_pdf[col].dtype} (hash would mismatch)",
            )

    if sorted(actual_cols) != sorted(expected_cols):
        return CompareResult(
            name, False, f"columns differ: spark={sorted(actual_cols)} duckdb={sorted(expected_cols)}"
        )
    if len(actual_rows) != len(expected_rows):
        return CompareResult(
            name, False, f"row counts differ: spark={len(actual_rows)} duckdb={len(expected_rows)}"
        )

    a = _canon_rows(actual_cols, actual_rows)
    e = _canon_rows(expected_cols, expected_rows)
    if a != e:
        diffs = [(x, y) for x, y in zip(a, e) if x != y][:max_mismatches_shown]
        return CompareResult(name, False, f"values differ; first mismatches: {diffs}")
    return CompareResult(name, True, f"{len(actual_rows)} rows, {len(actual_cols)} cols match")
