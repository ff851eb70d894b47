"""End-to-end tests for the packaged JavaScript client
(clients/javascript/sneldb.js): pytest starts the live TCP/HTTP/WS
frontends, then drives the actual JS file through `node` and asserts on
its JSON report — the same live-server replay strategy as
tests/test_client.py for the Python client."""

import json
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(ROOT, "tests", "js", "smoke.js")

node = shutil.which("node")
pytestmark = pytest.mark.skipif(node is None, reason="node not installed")


def _run_smoke(args):
    proc = subprocess.run(
        [node, SMOKE, *[str(a) for a in args]],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    return json.loads(proc.stdout.strip().splitlines()[-1])


EXPECT_ROWS = [["c1", 10, "NL"], ["c1", 25, "NL"]]


def _check(out, tag):
    assert out[f"{tag}_rows"] == EXPECT_ROWS
    assert out[f"{tag}_ping"] is True
    assert out[f"{tag}_bulk_ok"] is True  # storeMany BATCH round trips
    assert out[f"{tag}_bad_ok"] is False
    assert out[f"{tag}_bad_msg_nonempty"] is True


def test_js_client_all_transports(engine):
    from sneldb_spark.http_server import SnelDBHttpServer
    from sneldb_spark.server import SnelDBServer
    from sneldb_spark.ws_server import SnelDBWsServer

    tcp = SnelDBServer(engine).start()
    http = SnelDBHttpServer(engine).start()
    ws = SnelDBWsServer(engine).start()
    try:
        out = _run_smoke([tcp.address[1], http.address[1], ws.address[1]])
    finally:
        tcp.stop()
        http.stop()
        ws.stop()
    _check(out, "tcp")
    _check(out, "http")
    _check(out, "ws")
    assert out["cross_rows"] == 10  # HTTP sees what TCP stored (3 + 7 bulk)


def test_js_client_auth(spark, tmp_path):
    from sneldb_spark.auth import AuthConfig, AuthManager
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.http_server import SnelDBHttpServer
    from sneldb_spark.server import SnelDBServer
    from sneldb_spark.ws_server import SnelDBWsServer

    auth = AuthManager(config=AuthConfig(bypass_auth=False))
    auth.create_user("alice", "s3cret", roles=["admin"])
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    tcp = SnelDBServer(db).start()
    http = SnelDBHttpServer(db).start()
    ws = SnelDBWsServer(db).start()
    try:
        out = _run_smoke(
            [tcp.address[1], http.address[1], ws.address[1], "alice", "s3cret"]
        )
        _check(out, "tcp")
        _check(out, "http")
        _check(out, "ws")
        assert out["token"] is True

        # wrong key is refused at the transport boundary
        proc = subprocess.run(
            [node, SMOKE, str(tcp.address[1]), str(http.address[1]), "0",
             "alice", "wrong"],
            capture_output=True, text=True, timeout=120,
        )
        assert proc.returncode != 0
        assert "Auth" in proc.stderr
    finally:
        tcp.stop()
        http.stop()
        ws.stop()
