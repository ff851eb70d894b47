"""End-to-end tests for the packaged Ruby client
(clients/ruby/sneldb.rb): pytest starts the live TCP/HTTP frontends,
then drives the actual Ruby file through `ruby` and asserts on its JSON
report — the same live-server replay strategy as tests/test_js_client.py
for the JavaScript client. Skips cleanly where no Ruby runtime exists
(as the JS test does for node)."""

import json
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(ROOT, "tests", "ruby", "smoke.rb")

ruby = shutil.which("ruby")
pytestmark = pytest.mark.skipif(ruby is None, reason="ruby not installed")


def _run_smoke(args):
    proc = subprocess.run(
        [ruby, SMOKE, *[str(a) for a in args]],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    return json.loads(proc.stdout.strip().splitlines()[-1])


EXPECT_ROWS = [["c1", 10, "NL"], ["c1", 25, "NL"]]


def _check(out, tag):
    assert out[f"{tag}_rows"] == EXPECT_ROWS
    assert out[f"{tag}_ping"] is True
    assert out[f"{tag}_bulk_ok"] is True  # store_many! BATCH round trips
    assert out[f"{tag}_bad_ok"] is False
    assert out[f"{tag}_bad_msg_nonempty"] is True


def test_ruby_client_tcp_and_http(engine):
    from sneldb_spark.http_server import SnelDBHttpServer
    from sneldb_spark.server import SnelDBServer

    tcp = SnelDBServer(engine).start()
    http = SnelDBHttpServer(engine).start()
    try:
        out = _run_smoke([tcp.address[1], http.address[1]])
    finally:
        tcp.stop()
        http.stop()
    _check(out, "tcp")
    _check(out, "http")
    assert out["cross_rows"] == 10  # HTTP sees what TCP stored (3 + 7 bulk)


def test_ruby_client_auth(spark, tmp_path):
    from sneldb_spark.auth import AuthConfig, AuthManager
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.http_server import SnelDBHttpServer
    from sneldb_spark.server import SnelDBServer

    auth = AuthManager(config=AuthConfig(bypass_auth=False))
    auth.create_user("alice", "s3cret", roles=["admin"])
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    tcp = SnelDBServer(db).start()
    http = SnelDBHttpServer(db).start()
    try:
        out = _run_smoke(
            [tcp.address[1], http.address[1], "alice", "s3cret"]
        )
        _check(out, "tcp")
        _check(out, "http")
        assert out["token"] is True
    finally:
        tcp.stop()
        http.stop()
