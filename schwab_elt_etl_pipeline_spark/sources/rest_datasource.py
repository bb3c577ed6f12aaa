"""Executor-side REST ingestion as a PySpark Python Data Source (SURVEY S4).

The reference's polling services fetch market-data JSON one symbol at a time
on a single host (services/schwab_ohlc_service.py:50-98 per-symbol awaits,
services/schwab_chains_service.py:129-182 fetch_and_process, scheduled loops
at :246-281). That caps ingest throughput at one process's HTTP concurrency.

This module re-expresses the fetch itself as data-plane work with the public
``pyspark.sql.datasource`` API (Spark 4): the symbol universe is split into
:class:`InputPartition` chunks and each EXECUTOR performs its chunk's
fetches, so a 1000-executor cluster polls 1000 endpoints concurrently and
payloads land directly in tasks — never routed through the driver. Output is
the engine's Bronze envelope (symbol, payload JSON string, fetch epoch);
shaping stays in ``from_json`` + the explicit schemas (sources/rest.py), so
ingest is replayable from the audit table exactly like the reference's
verbatim-JSON capture (tools/db.py:741).

Two access paths:

- ``spark.read.format("rest_json")`` — one fetch sweep as a batch DataFrame.
- ``spark.readStream.format("rest_json")`` — the polling loop: each
  micro-batch is one poll cycle (offset = poll-epoch counter), the streaming
  twin of the reference's schedule-driven services. Late/duplicate handling
  stays downstream (streaming/quotes.py) — the source is at-least-once per
  cycle, like any re-pollable REST endpoint.

Fetchers are pluggable via the ``fetcher`` option and resolve on the
EXECUTOR (the class is pickled with its options only):

- ``file`` (default): ``{dir}/{symbol}.json`` fixture reads — deterministic
  tests, identical partitioning/codepath to the network fetcher.
- ``http``: ``urllib.request`` GET of ``endpoint.format(symbol=...)`` —
  stdlib-only; the sandbox has no egress so this path is exercised only for
  URL construction.

Registration is per-session: ``register(spark)`` then use the short name.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

#: Bronze envelope: raw payload plus provenance. ``fetch_epoch`` is the poll
#: cycle (0 for batch reads) so replays and streaming offsets line up.
ENVELOPE_DDL = "symbol STRING, payload STRING, fetch_epoch LONG"


class SymbolsPartition(InputPartition):
    """One executor task: fetch this chunk of the symbol universe."""

    def __init__(self, symbols: Sequence[str], epoch: int) -> None:
        self.symbols = list(symbols)
        self.epoch = epoch


def _chunk(symbols: Sequence[str], size: int) -> list[list[str]]:
    return [list(symbols[i : i + size]) for i in range(0, len(symbols), size)]


def _parse_options(options: dict) -> tuple[list[str], int, str, str]:
    symbols = [t for t in (s.strip() for s in (options.get("symbols") or "").split(",")) if t]
    if not symbols:
        raise ValueError("rest_json requires a 'symbols' option (comma-separated)")
    batch = int(options.get("batchsize", options.get("batchSize", "8")))
    fetcher = options.get("fetcher", "file")
    endpoint = options.get("endpoint", "")
    if fetcher not in ("file", "http"):
        raise ValueError(f"unknown fetcher {fetcher!r} (expected 'file' or 'http')")
    if not endpoint:
        raise ValueError("rest_json requires an 'endpoint' option")
    return symbols, max(1, batch), fetcher, endpoint


def _fetch(fetcher: str, endpoint: str, symbol: str) -> str | None:
    """Executor-side fetch of one symbol's payload; None = no data (the
    reference treats empty candle replies the same way, tools/schwab.py:934)."""
    if fetcher == "file":
        path = os.path.join(endpoint, f"{_safe_name(symbol)}.json")
        if not os.path.exists(path):
            return None
        with open(path, encoding="utf-8") as fh:
            return fh.read()
    url = endpoint.format(symbol=urllib.parse.quote(symbol, safe=""))
    try:  # pragma: no cover - no egress in the test harness
        with urllib.request.urlopen(url, timeout=30) as resp:
            return resp.read().decode("utf-8")
    except urllib.error.HTTPError as exc:
        if 400 <= exc.code < 500:
            return None  # 404-equivalent: unknown symbol skips, like the
            # file fetcher's missing fixture — one delisted symbol must not
            # kill the whole poll sweep
        raise  # 5xx: transient server fault — let Spark's task retry handle it


def _safe_name(symbol: str) -> str:
    """Fixture filename for a symbol ($SPX has a path-hostile prefix)."""
    return symbol.replace("$", "_S_").replace("/", "_")


def _read_partition(
    part: SymbolsPartition, fetcher: str, endpoint: str
) -> Iterator[tuple[str, str, int]]:
    for symbol in part.symbols:
        payload = _fetch(fetcher, endpoint, symbol)
        if payload is not None:
            yield (symbol, payload, part.epoch)


class RestJsonReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._symbols, self._batch, self._fetcher, self._endpoint = _parse_options(
            options
        )

    def partitions(self) -> Sequence[InputPartition]:
        return [SymbolsPartition(c, 0) for c in _chunk(self._symbols, self._batch)]

    def read(self, partition: SymbolsPartition) -> Iterator[tuple[str, str, int]]:
        return _read_partition(partition, self._fetcher, self._endpoint)


class RestJsonStreamReader(DataSourceStreamReader):
    """Poll-cycle streaming: offset n..m = poll cycles n..m-1, one sweep of
    the symbol universe per cycle. ``latestOffset`` advances exactly one
    cycle per trigger — trigger cadence IS the poll cadence, replacing the
    reference's sleep-loop schedulers (services/schwab_ohlc_service.py:156)."""

    def __init__(self, options: dict) -> None:
        self._symbols, self._batch, self._fetcher, self._endpoint = _parse_options(
            options
        )
        self._offset = 0

    def initialOffset(self) -> dict:
        return {"epoch": 0}

    def latestOffset(self) -> dict:
        self._offset += 1
        return {"epoch": self._offset}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # The poll counter lives in reader memory, not the checkpoint; after
        # a restart Spark replans from WAL offsets that may be ahead of a
        # fresh counter. Re-sync monotonically from every offset Spark hands
        # back (here and in commit) so latestOffset never regresses below
        # the checkpoint; a batch the WAL replays re-polls — at-least-once,
        # the documented contract of a re-pollable endpoint. ``start`` is
        # clamped too: under a processing-time trigger the restart call
        # order can hand a fresh counter an empty replayed range
        # (start > end) before any commit() — syncing on start alone makes
        # the very next latestOffset jump past the WAL high-water mark
        # instead of crawling up from 1 (re-polling one stale cycle per
        # trigger until it caught up).
        self._offset = max(self._offset, start["epoch"], end["epoch"])
        return [
            SymbolsPartition(chunk, epoch)
            for epoch in range(start["epoch"], end["epoch"])
            for chunk in _chunk(self._symbols, self._batch)
        ]

    def read(self, partition: SymbolsPartition) -> Iterator[tuple[str, str, int]]:
        return _read_partition(partition, self._fetcher, self._endpoint)

    def commit(self, end: dict) -> None:
        self._offset = max(self._offset, end["epoch"])  # see partitions()

    def stop(self) -> None:
        pass


class RestJsonDataSource(DataSource):
    """``format("rest_json")`` — options: symbols, endpoint, fetcher,
    batchSize (symbols per task)."""

    def __init__(self, options: dict) -> None:
        # Normalize option keys: Spark lower-cases DataFrameReader options.
        self._options = {k.lower(): v for k, v in options.items()}
        super().__init__(self._options)

    @classmethod
    def name(cls) -> str:
        return "rest_json"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return RestJsonReader(self._options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return RestJsonStreamReader(self._options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(RestJsonDataSource)


def write_fixture_dir(path: str, payloads: dict[str, dict | str]) -> None:
    """Lay out a fixture endpoint directory: one ``{symbol}.json`` per entry
    (test/dev helper for the ``file`` fetcher)."""
    os.makedirs(path, exist_ok=True)
    for symbol, payload in payloads.items():
        body = payload if isinstance(payload, str) else json.dumps(payload)
        with open(
            os.path.join(path, f"{_safe_name(symbol)}.json"), "w", encoding="utf-8"
        ) as fh:
            fh.write(body)
