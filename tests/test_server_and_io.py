"""TCP frontend, response framing, snapshots, materialization retention."""

import json

import pytest


def test_json_frames_shape(engine):
    from sneldb_spark.response import json_frames

    engine.execute('DEFINE f FIELDS { "n": "int" }')
    for i in range(5):
        engine.execute(f'STORE f FOR c{i} PAYLOAD {{ "n": {i} }}')
    engine.execute("FLUSH")
    frames = [json.loads(s) for s in json_frames(engine.query("QUERY f"), batch_size=2)]
    assert frames[0]["type"] == "schema"
    assert frames[0]["columns"][:4] == ["context_id", "event_type", "timestamp", "event_id"]
    batches = [f for f in frames if f["type"] == "batch"]
    assert [b["row_count"] for b in batches] == [2, 2, 1]
    assert frames[-1] == {"type": "end", "row_count": 5}


def test_arrow_ipc_roundtrip(engine):
    import pyarrow as pa

    from sneldb_spark.response import arrow_ipc_bytes

    engine.execute('DEFINE a FIELDS { "n": "int" }')
    engine.execute('STORE a FOR c1 PAYLOAD { "n": 42 }')
    engine.execute("FLUSH")
    buf = arrow_ipc_bytes(engine.query("QUERY a RETURN [n]"))
    table = pa.ipc.open_stream(buf).read_all()
    assert table.num_rows == 1
    assert table.column("n").to_pylist() == [42]


def test_tcp_server_end_to_end(engine):
    from sneldb_spark.server import SnelDBServer, send_commands

    server = SnelDBServer(engine).start()
    try:
        frames = send_commands(
            server.address,
            [
                'DEFINE tcp_t FIELDS { "v": "int" }',
                'STORE tcp_t FOR c1 PAYLOAD { "v": 7 }',
                "FLUSH",
                "QUERY tcp_t WHERE v = 7",
                "PING",
                "BOGUS COMMAND",
            ],
        )
    finally:
        server.stop()
    kinds = [f["type"] for f in frames]
    assert kinds[:3] == ["ok", "ok", "ok"]
    schema_i = kinds.index("schema")
    assert kinds[schema_i + 1] == "batch"
    assert frames[schema_i + 1]["row_count"] == 1
    assert "end" in kinds
    assert kinds[-2] == "ok"  # PING
    assert kinds[-1] == "error"  # BOGUS, server stays alive through it
    assert frames[-1]["message"]


def test_snapshot_export_import(engine, spark, tmp_path):
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.store.snapshot import export_snapshot, import_snapshot

    engine.execute('DEFINE snap FIELDS { "n": "int", "tag": "string | null" }')
    for i in range(3):
        engine.execute(f'STORE snap FOR c{i} PAYLOAD {{ "n": {i} }}')
    engine.execute("FLUSH")
    snap_dir = str(tmp_path / "snap_out")
    export_snapshot(engine.store, snap_dir)

    other = SnelDB(spark, str(tmp_path / "other_db"))
    import_snapshot(other.store, snap_dir)
    assert other.query("QUERY snap").count() == 3
    # schema (incl. nullability) survived the trip
    assert other.store.registry.get("snap").fields["tag"].nullable


def test_materialization_retention_max_rows(engine):
    engine.execute('DEFINE ret FIELDS { "n": "int" }')
    for i in range(5):
        engine.execute(f'STORE ret FOR c{i} PAYLOAD {{ "n": {i} }}')
    engine.execute("FLUSH")
    from sneldb_spark.commands.parser import parse_command

    q = parse_command("QUERY ret")
    engine.materializer.remember("recent", q, max_rows=3)
    shown = engine.materializer.show("recent")
    rows = sorted(r["n"] for r in shown.collect())
    assert rows == [2, 3, 4]  # newest three kept
    # retention holds across incremental refresh
    engine.execute('STORE ret FOR c9 PAYLOAD { "n": 9 }')
    engine.execute("FLUSH")
    rows2 = sorted(r["n"] for r in engine.materializer.show("recent").collect())
    assert rows2 == [3, 4, 9]
