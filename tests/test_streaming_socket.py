"""The socket transport swap-in, actually exercised: a local TCP feeder
pushes JSON tick messages through ``read_quote_stream(fmt="socket")`` and the
decoded rows must match the parquet-transport schema and values."""

from __future__ import annotations

import json
import socket
import threading
import time

import pytest

pytestmark = pytest.mark.slow  # full suite is the gate; -m 'not slow' is the fast path

from schwab_elt_etl_pipeline_spark.streaming.quotes import read_quote_stream

TICKS = [
    {"received_at": 1718634600000, "symbol": "$SPX", "3": 5500.0, "35": 1718634600000},
    {
        "received_at": 1718634601000,
        "symbol": "SPXW  240621C05500000",
        "37": 12.5,
        "38": 1718634601000,
    },
    {"received_at": 1718634602000, "symbol": "$SPX", "3": 5501.0, "35": 1718634602000},
]


class _Feeder(threading.Thread):
    """One-shot TCP server: accept a single client, write the ticks (plus a
    malformed poison line that must be dropped), hold the connection open
    until stopped (the socket source reconnects-and-replays on EOF, which
    would duplicate rows mid-test)."""

    def __init__(self) -> None:
        super().__init__(daemon=True)
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._halt = threading.Event()

    def run(self) -> None:
        conn, _ = self._srv.accept()
        with conn:
            payload = "".join(json.dumps(t) + "\n" for t in TICKS)
            payload += "not json at all\n" + json.dumps({"no_symbol": 1}) + "\n"
            conn.sendall(payload.encode())
            self._halt.wait(timeout=180)
        self._srv.close()

    def halt(self) -> None:
        self._halt.set()


def test_socket_transport_decodes_ticks(spark):
    feeder = _Feeder()
    feeder.start()
    stream = read_quote_stream(
        spark, source_dir="", fmt="socket",
        options={"host": "127.0.0.1", "port": str(feeder.port)},
    )
    name = "socket_ticks"
    q = (
        stream.filter("symbol IS NOT NULL")  # poison-pill guard contract
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) n FROM {name}").first()["n"] >= len(TICKS):
                break
            time.sleep(0.5)
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        assert len(rows) == len(TICKS), "socket rows missing or duplicated"
        got = {(r["received_at"], r["symbol"], r["3"], r["37"]) for r in rows}
        want = {
            (t["received_at"], t["symbol"], t.get("3"), t.get("37")) for t in TICKS
        }
        assert got == want
        # decoded schema is the transport-agnostic QUOTES_STREAM contract
        assert set(rows[0].asDict()) == {
            "received_at", "symbol", "37", "38", "3", "35",
        }
    finally:
        q.stop()
        feeder.halt()
        feeder.join(timeout=10)
