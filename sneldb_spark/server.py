"""Thin TCP frontend: newline-delimited commands in, JSON frames out.

The engine analogue of the reference's TCP listener
(reference: src/frontend/tcp/listener.rs): one line = one command; read
commands stream schema/batch/end frames; write commands answer one
{"type":"ok"|"error"} line. The frontend is deliberately thin — all
semantics live in the engine; a production deployment would put any
HTTP/WS layer in front of the same `SnelDB.execute` calls.

Auth (HMAC users/permissions in the reference) is out of scope for the
engine core: at cluster scale that belongs to the service tier in front of
the SparkSession, not inside query execution.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading

from sneldb_spark.engine import SnelDB
from sneldb_spark.errors import SnelDBError
from sneldb_spark.response import json_frames


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        engine: SnelDB = self.server.engine  # type: ignore[attr-defined]
        for raw in self.rfile:
            line = raw.decode("utf-8", errors="replace").strip()
            if not line:
                continue
            if line.upper() in ("QUIT", "EXIT"):
                break
            try:
                result = engine.execute(line)
                if result.df is not None:
                    for frame in json_frames(result.df):
                        self.wfile.write((frame + "\n").encode())
                else:
                    self.wfile.write(
                        (json.dumps({"type": "ok", "message": result.message}) + "\n").encode()
                    )
            except SnelDBError as e:
                self.wfile.write(
                    (json.dumps({"type": "error", "message": str(e)}) + "\n").encode()
                )
            except Exception as e:  # engine bug: report, keep serving
                self.wfile.write(
                    (json.dumps({"type": "error", "message": f"internal: {e}"}) + "\n").encode()
                )
            self.wfile.flush()


class SnelDBServer:
    """Threaded TCP server bound to one engine instance."""

    def __init__(self, engine: SnelDB, host: str = "127.0.0.1", port: int = 0):
        self._server = socketserver.ThreadingTCPServer((host, port), _Handler)
        self._server.daemon_threads = True
        self._server.engine = engine  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> tuple[str, int]:
        return self._server.server_address  # type: ignore[return-value]

    def start(self):
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._server.shutdown()
        self._server.server_close()


def send_commands(address: tuple[str, int], commands: list[str], timeout: float = 60.0) -> list[dict]:
    """Small client helper: send commands, collect all reply frames."""
    frames: list[dict] = []
    with socket.create_connection(address, timeout=timeout) as sock:
        f = sock.makefile("rwb")
        for cmd in commands:
            f.write((cmd.strip() + "\n").encode())
        f.write(b"QUIT\n")
        f.flush()
        for raw in f:
            frames.append(json.loads(raw))
    return frames
