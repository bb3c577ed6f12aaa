"""Freshness monitoring (SURVEY T4/T5, P10).

The reference polls Redis/parquet ages every 30 s and alerts after 2
consecutive violations (services/schwab_stream_monitor.py:52-176,
config.yaml:71-73,82). Engine equivalents:

- ``freshness_metrics``: per-store age metrics as a DataFrame expression —
  usable on a static snapshot or inside ``foreachBatch``.
- ``TwoStrikeMonitor``: the 2-consecutive-violations alert state machine,
  driver-side (monitoring cadence is orchestration, not data-plane work).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def freshness_metrics(
    quotes: DataFrame,
    now_ms: int,
    fresh_seconds: int = 60,
    symbol_prefix: str = "SPXW",
) -> DataFrame:
    """Counts of fresh vs stale symbols at ``now_ms``
    (services/schwab_stream_monitor.py:120-128: age ≤ threshold, SPXW-only)."""
    latest = (
        quotes.filter(F.col("symbol").startswith(symbol_prefix))
        .groupBy("symbol")
        .agg(F.max("received_at").alias("received_at"))
    )
    age_sec = (F.lit(now_ms) - F.col("received_at")) / 1000.0
    return latest.agg(
        F.count(F.lit(1)).alias("n_symbols"),
        F.sum((age_sec <= fresh_seconds).cast("int")).alias("n_fresh"),
        F.sum((age_sec > fresh_seconds).cast("int")).alias("n_stale"),
        F.max(age_sec).alias("max_age_sec"),
    )


@dataclass
class TwoStrikeMonitor:
    """Alert after N consecutive violations (default 2, mirroring
    services/schwab_stream_monitor.py:164-175)."""

    strikes_to_alert: int = 2
    _strikes: int = field(default=0, init=False)
    alerts: list[str] = field(default_factory=list, init=False)

    def observe(self, violated: bool, message: str = "freshness violation") -> bool:
        """Feed one poll result; returns True when an alert fires."""
        if not violated:
            self._strikes = 0
            return False
        self._strikes += 1
        if self._strikes >= self.strikes_to_alert:
            self.alerts.append(message)
            self._strikes = 0
            return True
        return False
