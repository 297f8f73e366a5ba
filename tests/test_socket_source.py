"""Loopback test for the socket sources (S1/S2) — the reference's demo
workflow is `nc -l 9999/8888` + paste JSON lines (README.md:25-30); here a
local listener plays nc and the engine's socket source consumes it."""

from __future__ import annotations

import json
import socket
import threading
import time
import uuid

import pytest

from flink_cep_task_spark.streaming.pipeline import metric_source


class _LineServer:
    """Tiny nc -l: accepts one client and writes the given lines."""

    def __init__(self, lines: list[str]):
        self.lines = lines
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.conn = None
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        self.conn, _ = self.sock.accept()
        payload = "".join(line + "\n" for line in self.lines)
        self.conn.sendall(payload.encode())
        # keep the connection open: the socket source treats EOF as stream
        # end; the test stops the query explicitly.

    def close(self):
        for s in (self.conn, self.sock):
            try:
                if s is not None:
                    s.close()
            except OSError:
                pass


def test_metric_socket_roundtrip(spark):
    events = [
        {"eventTime": 1_700_000_000_000, "t_g": "g0", "cpu_usage": 55},
        {"eventTime": 1_700_000_060_000, "t_g": "g1", "cpu_usage": 70},
    ]
    lines = [json.dumps(e) for e in events] + ["definitely not json {"]
    server = _LineServer(lines)
    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = None
    try:
        metrics = metric_source(spark, "socket", host="127.0.0.1", port=server.port)
        q = (
            metrics.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.table(name).collect()
            if len(rows) >= 2:
                break
            time.sleep(0.5)
        assert len(rows) == 2, f"expected 2 parsed rows, got {rows}"
        got = {
            (r.tags["t_g"], int(r.metrics["cpu_usage"]),
             int(r.event_time.timestamp() * 1000))
            for r in rows
        }
        assert got == {("g0", 55, 1_700_000_000_000), ("g1", 70, 1_700_000_060_000)}
    finally:
        if q is not None:
            q.stop()
        server.close()


def test_metric_source_unknown_kind(spark):
    with pytest.raises(ValueError):
        metric_source(spark, "carrier-pigeon")
