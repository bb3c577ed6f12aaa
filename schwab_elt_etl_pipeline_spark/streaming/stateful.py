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
                if last_ms is not None and ms <= last_ms:
                    # late or duplicate tick (cross-batch order is not
                    # guaranteed): moving last_ms backwards would both
                    # manufacture a spurious gap on the next on-time tick
                    # and wipe legitimate strike counts
                    continue
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


# ---------------------------------------------------------------------------
# T6 drift watchdog
# ---------------------------------------------------------------------------

#: output: one row per drift-triggered resubscription
DRIFT_SCHEMA = "symbol string, at_ms long, price double, baseline double, drift double"
#: state: the price the current subscription was built around
_DRIFT_STATE_SCHEMA = "baseline double"


def drift_watchdog(quotes_stream: DataFrame, threshold: float = 30.0) -> DataFrame:
    """T6 drift-triggered resubscription as a stateful stream operator.

    The reference regenerates its strike universe when the underlying moves
    ≥ 30 points from the price it subscribed at
    (services/schwab_stream.py:126-131,190-201). Here the same trigger is
    per-symbol state (``applyInPandasWithState``): the state holds the
    subscription baseline; a tick drifting ≥ ``threshold`` from it emits a
    resubscribe event and re-baselines at that tick. State survives
    micro-batch boundaries and restarts via the checkpoint.

    (A ``transformWithStateInPandas``/StatefulProcessor form would be the
    Spark 4-native spelling, but its Python side requires protobuf, absent
    from this runtime; the GroupState form below is semantically identical.)

    Input rows need ``symbol``, ``received_at`` (epoch ms), and the
    underlying price in field ``3``. Rows without a price are ignored.
    """

    def track_drift(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        (baseline,) = state.get if state.exists else (None,)

        ticks: list[tuple[int, float]] = []
        for pdf in pdfs:
            sub = pdf[["received_at", "3"]].dropna()
            ticks.extend(
                (int(ms), float(px)) for ms, px in zip(sub["received_at"], sub["3"])
            )
        out: list[tuple[str, int, float, float, float]] = []
        for ms, px in sorted(ticks):
            if baseline is None:
                baseline = px
            elif abs(px - baseline) >= threshold:
                out.append((symbol, ms, px, baseline, px - baseline))
                baseline = px
        if baseline is not None:
            state.update((baseline,))
        if out:
            yield pd.DataFrame(
                out, columns=["symbol", "at_ms", "price", "baseline", "drift"]
            )

    return quotes_stream.groupBy("symbol").applyInPandasWithState(
        track_drift,
        outputStructType=DRIFT_SCHEMA,
        stateStructType=_DRIFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
