"""Custom stateful streaming operator: per-symbol staleness watchdog.

The reference's watchdog threads poll for silent streams and alert after
consecutive violations (T4/T5: services/schwab_stream.py:96-140,
schwab_stream_monitor.py:52-176). As a streaming operator this is per-key
state — last-seen timestamp + consecutive-violation strikes — maintained by
``applyInPandasWithState`` (the arbitrary-stateful-processing API; state lives
in the state store, scales with key cardinality, survives restarts via
checkpoint).

Semantics (deterministic, event-data-driven): for each symbol, inspect gaps
between consecutive ``received_at`` ticks; a gap over ``gap_seconds`` is one
strike; ``strikes_to_alert`` consecutive gaps emit an alert row and reset —
the streaming generalization of :class:`streaming.freshness.TwoStrikeMonitor`.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output: one row per alert
ALERT_SCHEMA = "symbol string, at_ms long, gap_sec double, strikes int"
#: state: last seen tick + running strike count
_STATE_SCHEMA = "last_ms long, strikes int"


def gap_watchdog(
    quotes_stream: DataFrame,
    gap_seconds: float = 30.0,
    strikes_to_alert: int = 2,
) -> DataFrame:
    """Per-symbol stateful gap detection over a streaming quotes DataFrame."""
    gap_ms = int(gap_seconds * 1000)

    def check_gaps(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        last_ms, strikes = state.get if state.exists else (None, 0)

        alerts: list[tuple[str, int, float, int]] = []
        for pdf in pdfs:
            for ms in sorted(int(v) for v in pdf["received_at"].dropna()):
                if last_ms is not None:
                    gap = ms - last_ms
                    if gap > gap_ms:
                        strikes += 1
                        if strikes >= strikes_to_alert:
                            alerts.append((symbol, ms, gap / 1000.0, strikes))
                            strikes = 0
                    else:
                        strikes = 0
                last_ms = ms
        state.update((last_ms, strikes))
        yield pd.DataFrame(alerts, columns=["symbol", "at_ms", "gap_sec", "strikes"])

    return (
        quotes_stream.select("symbol", "received_at")
        .groupBy("symbol")
        .applyInPandasWithState(
            check_gaps,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
