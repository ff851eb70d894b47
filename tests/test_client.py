"""Packaged Python client (sneldb_spark/client.py) against the real TCP
and HTTP frontends — the engine analogue of the reference's
clients/python test suite."""

import pytest

from sneldb_spark.client import (
    ClientAuthError,
    ClientCommandError,
    SnelDBClient,
)


@pytest.fixture()
def tcp_server(engine):
    from sneldb_spark.server import SnelDBServer

    server = SnelDBServer(engine).start()
    yield server
    server.stop()


@pytest.fixture()
def http_server(engine):
    from sneldb_spark.http_server import SnelDBHttpServer

    server = SnelDBHttpServer(engine).start()
    yield server
    server.stop()


def _exercise(client: SnelDBClient):
    assert client.ping()
    client.define("trip", {"km": "int", "city": "string"})
    client.store("trip", "c1", {"km": 12, "city": "NL"})
    client.store("trip", "c2", {"km": 40, "city": "DE"})
    client.flush()
    rows = client.query('QUERY trip WHERE km > 5 ORDER BY km')
    assert [r["km"] for r in rows] == [12, 40]
    assert rows[0]["city"] == "NL" and rows[0]["context_id"] == "c1"
    res = client.execute("QUERY trip COUNT BY city")
    assert res.ok and res.row_count == 2
    assert {r["city"]: r["count"] for r in res.rows} == {"NL": 1, "DE": 1}
    # errors surface as typed exceptions / non-ok results
    with pytest.raises(ClientCommandError):
        client.execute("QUERY nope OFFSET 3")
    bad = client.try_execute("BOGUS")
    assert not bad.ok and bad.message


def test_tcp_client_end_to_end(tcp_server):
    host, port = tcp_server.address
    with SnelDBClient(f"tcp://{host}:{port}") as client:
        _exercise(client)


def test_http_client_end_to_end(http_server):
    host, port = http_server.address
    with SnelDBClient(f"http://{host}:{port}") as client:
        _exercise(client)


def test_http_client_arrow_output(http_server, engine):
    """output_format="arrow": read results ride the Arrow IPC content
    negotiation and parse columnar; records match the JSON path."""
    host, port = http_server.address
    with SnelDBClient(f"http://{host}:{port}") as setup:
        setup.define("ar", {"n": "int"})
        for i in range(3):
            setup.store("ar", f"c{i}", {"n": i})
        setup.flush()
        via_json = setup.query("QUERY ar RETURN [n] ORDER BY n")
    with SnelDBClient(f"http://{host}:{port}", output_format="arrow") as client:
        res = client.execute("QUERY ar RETURN [n] ORDER BY n")
        assert res.row_count == 3 and res.columns is not None
        assert [r["n"] for r in res.rows] == [0, 1, 2]
        assert [r["n"] for r in via_json] == [r["n"] for r in res.rows]
        # writes still answer plain ok frames under arrow mode
        assert client.execute("PING").message == "PONG"


def test_ws_client_end_to_end(engine):
    from sneldb_spark.ws_server import SnelDBWsServer

    server = SnelDBWsServer(engine).start()
    try:
        host, port = server.address
        with SnelDBClient(f"ws://{host}:{port}") as client:
            _exercise(client)
    finally:
        server.stop()


def test_client_replays_reference_scenarios(tcp_server, engine):
    """Client-driven replay: commands from ported reference scenarios run
    through the packaged client must produce the same records the engine
    yields directly (frame parsing is lossless)."""
    commands = [
        'DEFINE login FIELDS { "device": "string", "n": "int | null" }',
        'STORE login FOR u1 PAYLOAD { "device": "ios", "n": 1 }',
        'STORE login FOR u2 PAYLOAD { "device": "android", "n": 2 }',
        'STORE login FOR u1 PAYLOAD { "device": "web", "n": 3 }',
        "FLUSH",
        'QUERY login WHERE device != "web" ORDER BY timestamp',
        "QUERY login FOR u1 COUNT",
        'QUERY login WHERE n >= 2 RETURN [device, n] ORDER BY n DESC LIMIT 1',
    ]
    host, port = tcp_server.address
    with SnelDBClient(f"tcp://{host}:{port}") as client:
        via_client = {c: client.execute(c) for c in commands}
    # writes happened exactly once (through the client); re-run only the
    # idempotent reads directly on the shared engine and compare records
    reads = [c for c in commands if c.startswith("QUERY")]
    assert all(r.ok for r in via_client.values())
    for cmd in reads:
        got = via_client[cmd]
        direct = [r.asDict() for r in engine.query(cmd).collect()]
        assert len(got.rows) == len(direct), cmd
        for g, d in zip(got.rows, direct):
            assert set(g) == set(d)
            for k, v in d.items():
                assert g[k] == v, (cmd, k, g[k], v)


def test_client_auth_flow(spark, tmp_path):
    from sneldb_spark.auth import AuthConfig, AuthManager
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.server import SnelDBServer

    auth = AuthManager(config=AuthConfig(bypass_auth=False))
    auth.create_user("alice", "s3cret", roles=["admin"])
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    server = SnelDBServer(db).start()
    try:
        host, port = server.address
        # stateless inline signing works per command
        with SnelDBClient(
            f"tcp://{host}:{port}", user_id="alice", secret_key="s3cret"
        ) as client:
            assert client.ping()
            # token handshake swaps to TOKEN-suffixed commands
            token = client.authenticate()
            assert token
            client.define("evt", {"x": "int"})
            client.store("evt", "c1", {"x": 5})
            client.flush()
            assert [r["x"] for r in client.query("QUERY evt")] == [5]
        # wrong key is refused
        with SnelDBClient(
            f"tcp://{host}:{port}", user_id="alice", secret_key="wrong"
        ) as client:
            with pytest.raises(ClientAuthError):
                client.execute("PING")
    finally:
        server.stop()


def test_unix_socket_client_end_to_end(engine, tmp_path):
    from sneldb_spark.server import SnelDBUnixServer

    sock = str(tmp_path / "sneldb.sock")
    server = SnelDBUnixServer(engine, sock).start()
    try:
        with SnelDBClient(f"unix://{sock}") as client:
            _exercise(client)
    finally:
        server.stop()


def test_client_materialization_lifecycle_and_within(tcp_server):
    """FORGET and WITHIN ride the generic line protocol: REMEMBER a
    windowed funnel over TCP, SHOW it, FORGET it, and confirm the drop."""
    host, port = tcp_server.address
    c = SnelDBClient(f"tcp://{host}:{port}")
    try:
        c.define("a", {"v": "int"})
        c.define("b", {"v": "int"})
        c.store("a", "u1", {"v": 1})
        c.store("b", "u1", {"v": 2})
        c.flush()
        r = c.execute(
            "REMEMBER QUERY a FOLLOWED BY b LINKED BY context_id "
            "WITHIN 3600 AS funnel_w"
        )
        assert r.ok
        rows = c.query("SHOW funnel_w")
        assert len(rows) == 1 and rows[0]["a_context_id"] == "u1"
        assert c.execute("FORGET funnel_w").ok
        bad = c.try_execute("SHOW funnel_w")
        assert not bad.ok
    finally:
        c.close()


def test_client_store_many_batches(tcp_server):
    """store_many chunks events into BATCH round trips (group-committed
    server-side) and surfaces the first failed batch."""
    host, port = tcp_server.address
    with SnelDBClient(f"tcp://{host}:{port}") as client:
        client.define("bulk", {"n": "int"})
        events = [(f"c{i}", {"n": i}) for i in range(250)]
        res = client.store_many("bulk", events, batch_size=100)  # 3 batches
        assert res.ok
        client.flush()
        rows = client.query("QUERY bulk")
        assert len(rows) == 250
        # a bad payload mid-stream stops at that batch
        bad = [("c1", {"n": 1}), ("c2", {"n": "not-an-int"})]
        res2 = client.store_many("bulk", bad, batch_size=1)
        assert not res2.ok and res2.message


def test_client_store_many_hostile_payloads(tcp_server):
    """Payload strings containing quotes, semicolons, and brackets must
    survive the BATCH round trip byte-for-byte (the splitter honors JSON
    escapes; the JSON decoder does the rest)."""
    host, port = tcp_server.address
    hostile = 'a" ] ;x \\ {see}; DROP'
    with SnelDBClient(f"tcp://{host}:{port}") as client:
        client.define("hostile", {"msg": "string"})
        res = client.store_many(
            "hostile",
            [("c1", {"msg": hostile}), ("c2", {"msg": "plain"})],
            batch_size=2,  # both in ONE batch body
        )
        assert res.ok
        client.flush()
        rows = client.query("QUERY hostile")
        assert {r["context_id"]: r["msg"] for r in rows} == {
            "c1": hostile, "c2": "plain",
        }
        # empty list: synthetic OK, no round trip
        assert client.store_many("hostile", []).ok


def test_execute_stream_abandoned_resyncs_connection(tcp_server):
    """ADVICE r9: a caller that abandons execute_stream before the
    terminal frame (e.g. breaks after measuring time-to-first-frame)
    must not leave unread frames buffered — the generator's close path
    drains to the terminal so the NEXT command on the same connection
    parses its own response, not leftovers."""
    host, port = tcp_server.address
    with SnelDBClient(f"tcp://{host}:{port}") as client:
        client.define("streamer", {"n": "int"})
        for i in range(6):
            client.store("streamer", f"sc{i}", {"n": i})
        client.flush()

        gen = client.execute_stream("QUERY streamer")
        first = next(gen)
        assert first["type"] == "schema"
        gen.close()  # abandon: batch + end frames still on the wire

        # the same connection answers the next command correctly
        res = client.execute("QUERY streamer COUNT")
        assert res.ok and res.rows[0]["count"] == 6

        # and a fully-drained stream still works end-to-end afterwards
        frames = list(client.execute_stream("QUERY streamer"))
        assert frames[0]["type"] == "schema"
        assert frames[-1]["type"] == "end"
        assert frames[-1]["row_count"] == 6
