"""Streaming observability: per-micro-batch progress metrics as a table.

The reference scatters operational visibility across log files and a Redis
freshness cache (tools/logger.py, tools/redis_cache.py); the engine's
equivalent is a ``StreamingQueryListener`` that captures every micro-batch's
progress event (rows, duration, per-source offsets, state-store size) and
exposes it as a DataFrame / warehouse table — queryable with the same engine
(lag dashboards, throughput regressions, state-growth alerts are then just
catalog-style queries over ``stream_progress``).

Driver-side cost: progress events are kilobyte-scale JSON at trigger
cadence — bounded by ``max_events`` (ring buffer), never by stream volume.
"""

from __future__ import annotations

import json
from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

#: Typed schema for the flattened progress record.
PROGRESS_SCHEMA = (
    "query_id STRING, run_id STRING, batch_id BIGINT, ts STRING, "
    "num_input_rows BIGINT, input_rows_per_second DOUBLE, "
    "process_rows_per_second DOUBLE, batch_duration_ms BIGINT, "
    "state_rows BIGINT, state_bytes BIGINT, sources STRING, observed STRING"
)


class ProgressRecorder(StreamingQueryListener):
    """Ring-buffer recorder of micro-batch progress across all queries on
    the session. Attach with ``spark.streams.addListener(rec)``; flatten
    with :meth:`to_df`; persist with :meth:`flush_to`."""

    def __init__(self, max_events: int = 10_000):
        import threading

        self._events: deque[dict] = deque(maxlen=max_events)
        # listener callbacks run on Spark's listener-bus thread while
        # to_df/flush_to run on the caller's: unsynchronized iteration of a
        # deque under concurrent append raises, and a clear() after a
        # snapshot erases events appended in between (never flushed)
        self._lock = threading.Lock()
        self._seq = 0

    # -- listener callbacks (called on the driver's listener bus) ----------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        durations = p.get("durationMs") or {}
        # SUM across stateOperators: a stream-stream join + aggregation has
        # several; reporting only the first hides the operator that leaks
        ops = p.get("stateOperators") or []
        state = {
            "numRowsTotal": sum(o.get("numRowsTotal", 0) for o in ops),
            "memoryUsedBytes": sum(o.get("memoryUsedBytes", 0) for o in ops),
        }
        row = (
            {
                "query_id": p.get("id"),
                "run_id": p.get("runId"),
                "batch_id": p.get("batchId"),
                "ts": p.get("timestamp"),
                "num_input_rows": p.get("numInputRows", 0),
                "input_rows_per_second": float(p.get("inputRowsPerSecond") or 0.0),
                "process_rows_per_second": float(
                    p.get("processedRowsPerSecond") or 0.0
                ),
                "batch_duration_ms": durations.get("triggerExecution", 0),
                "state_rows": state.get("numRowsTotal", 0),
                "state_bytes": state.get("memoryUsedBytes", 0),
                "sources": json.dumps(
                    [s.get("description") for s in p.get("sources") or []]
                ),
                # df.observe() metrics (e.g. operators/quality.py
                # observed_rules): per-batch DQ counters with zero extra
                # passes, keyed by observation name
                "observed": json.dumps(p.get("observedMetrics") or {}),
            }
        )
        with self._lock:
            self._seq += 1
            row["_seq"] = self._seq
            self._events.append(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- consumption --------------------------------------------------------
    def _snapshot(self) -> list[dict]:
        with self._lock:
            return [dict(e) for e in self._events]

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The recorded progress as a typed DataFrame (empty-safe)."""
        rows = [{k: v for k, v in e.items() if k != "_seq"} for e in self._snapshot()]
        return spark.createDataFrame(rows, PROGRESS_SCHEMA)

    def flush_to(self, table) -> int:
        """Append the buffered events to a warehouse table and clear the
        buffer. Returns the number of events flushed. ``table`` is a
        ``ParquetTable``; events are keyed (run_id, batch_id) so a re-flush
        after a crash inserts nothing twice."""
        events = self._snapshot()
        if not events:
            return 0
        spark = SparkSession.getActiveSession()
        df = spark.createDataFrame(
            [{k: v for k, v in e.items() if k != "_seq"} for e in events],
            PROGRESS_SCHEMA,
        )
        # insert_new covers the missing-table branch itself (with key dedup)
        table.insert_new(df, keys=["run_id", "batch_id"])
        # drain ONLY what was flushed: events appended during the write stay
        # buffered for the next flush (a bare clear() would erase them)
        flushed_through = events[-1]["_seq"]
        with self._lock:
            while self._events and self._events[0]["_seq"] <= flushed_through:
                self._events.popleft()
        return len(events)
