"""Latest-quote-per-key view on the transformWithState API (Spark 4).

The reference's Redis cache holds the newest quote per symbol with a TTL
(tools/redis_cache.py semantics; S7). The engine already expresses this two
ways — a batch/foreachBatch reduction (``streaming/quotes.py
latest_per_key``) and watermarked streaming dedup. This module is the
third, fully-streaming form on the MODERN stateful API
(``transformWithStateInPandas``, Spark 4): per-key ValueState holds the
newest (ts, mark) and the state store itself enforces the TTL
(``ttlDurationMs`` — expiry is the store's job, not application code), so
the operator emits a row only when a key's latest value CHANGES — a
changelog of the KV view, which is exactly what a downstream cache sink
wants to consume (idempotent point upserts, no full-view rewrites).

vs ``applyInPandasWithState`` (``streaming/stateful.py``): the new API
gives named per-state TTL, composable state variables, and timer callbacks;
the old API gives one opaque state tuple per key with manual timeout
bookkeeping. New stateful operators should start here; the watchdogs stay
on the old API deliberately so both surfaces remain covered.

Environment gate: the transformWithState driver protocol needs
``google.protobuf`` (pyspark's StateMessage proto) and the RocksDB state
store provider. The protobuf package is absent from this container, so the
end-to-end test is skip-marked (exactly like the optional-codec multimodal
tests); the processor's reduction semantics are pinned by direct unit tests
against a fake ValueState, and ``required_confs`` names what a deployment
must set.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

#: changelog row: the key's new latest value
LATEST_SCHEMA = "symbol STRING, ts_ms BIGINT, mark DOUBLE"
_STATE_SCHEMA = "ts_ms BIGINT, mark DOUBLE"


class LatestQuoteProcessor(StatefulProcessor):
    """Emit (symbol, ts_ms, mark) whenever a symbol's newest quote advances.

    Out-of-order and duplicate ticks within or across batches are absorbed:
    only a strictly newer ``ts_ms`` updates state and emits. With
    ``ttl_ms`` the state store drops idle keys, so a symbol that stops
    ticking re-emits its first tick after the quiet period — cache-expiry
    semantics without any application-side clock handling.
    """

    def __init__(self, ttl_ms: int | None = None) -> None:
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._latest = handle.getValueState("latest", _STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        newest_ts, newest_mark = None, None
        for pdf in rows:
            pdf = pdf.dropna(subset=["ts_ms", "mark"])  # a tick missing
            # its mark must not poison state with NaN
            if pdf.empty:
                continue
            row = pdf.loc[pdf["ts_ms"].idxmax()]
            ts = int(row["ts_ms"])
            if newest_ts is None or ts > newest_ts:
                newest_ts, newest_mark = ts, float(row["mark"])
        if newest_ts is None:
            return
        prev = self._latest.get() if self._latest.exists() else None
        if prev is not None and int(prev[0]) >= newest_ts:
            return  # stale or duplicate: the view already has newer data
        self._latest.update((newest_ts, newest_mark))
        yield pd.DataFrame(
            {"symbol": [key[0]], "ts_ms": [newest_ts], "mark": [newest_mark]}
        )

    def close(self) -> None:
        pass


def latest_quote_changelog(
    quotes_stream: DataFrame,
    ttl_seconds: float | None = None,
    ts_col: str = "received_at",
    mark_col: str = "37",
) -> DataFrame:
    """Wire a quotes stream (QUOTES_STREAM shape) into the changelog view."""
    from pyspark.sql import functions as F

    ticks = quotes_stream.select(
        F.col("symbol"),
        F.col(ts_col).cast("long").alias("ts_ms"),
        F.col(mark_col).cast("double").alias("mark"),
    ).filter(F.col("symbol").isNotNull())
    ttl_ms = int(ttl_seconds * 1000) if ttl_seconds else None
    return ticks.groupBy("symbol").transformWithStateInPandas(
        LatestQuoteProcessor(ttl_ms),
        outputStructType=LATEST_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if ttl_ms else "none",
    )


#: Session confs a transformWithState deployment must carry (the default
#: HDFS-backed store does not implement the API).
required_confs = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
}


def tws_available() -> bool:
    """True when the container can run the transformWithState protocol."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
