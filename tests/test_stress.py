"""Load-generator tool (tools/stress.py — reference stress_tcp/http/ws
parity): concurrent STORE ingest over a real frontend, throughput summary
and REPLAY/QUERY latency samples."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.fixture()
def tcp_server(engine):
    from sneldb_spark.server import SnelDBServer

    server = SnelDBServer(engine).start()
    yield server
    server.stop()


def test_stress_tcp_roundtrip(tcp_server, engine):
    from stress import run_stress

    host, port = tcp_server.address
    summary = run_stress(
        f"tcp://{host}:{port}",
        events=120,
        concurrency=4,
        contexts=10,
        sample_ctx="ctx-5",
        progress=False,
    )
    assert summary["events"] == 120 and summary["errors"] == 0
    assert summary["events_per_sec"] > 0
    # ctx-5 holds every 10th sequence number -> 12 rows replayed
    assert summary["replay_rows"] == 12
    # ids 0..99 pass the sampled WHERE id < 100 filter
    assert summary["query_rows"] == 100
    assert summary["replay_ms"] > 0 and summary["query_ms"] > 0
    # the ingested rows are queryable through the engine afterwards
    rows = engine.query("QUERY stress_evt COUNT").collect()
    assert rows[0]["count"] == 120


def test_stress_cli_parses_env(monkeypatch):
    from stress import main

    monkeypatch.setenv("SNEL_STRESS_EVENTS", "7")
    # bad endpoint -> connection error surfaces, but arg parsing works
    with pytest.raises(Exception):
        main(["tcp://127.0.0.1:1"])
