"""Storage inspector (tools/inspect.py — reference convertor.rs parity):
every report is assembled from footers/sidecars only, with no Spark
session, and reflects exactly what the engine's pruning machinery sees."""

import json
import os

import pytest


@pytest.fixture()
def populated(engine):
    engine.execute('DEFINE order FIELDS { "amount": "int", "region": "string" }')
    for i in range(10):
        engine.execute(
            f'STORE order FOR ctx_{i % 3} PAYLOAD {{"amount": {i * 10}, "region": "NL"}}'
        )
    engine.execute("FLUSH")
    engine.execute('REMEMBER QUERY order WHERE amount >= 50 AS big_orders')
    # one un-flushed row so the WAL has a visible tail (REMEMBER flushes,
    # so this must come last)
    engine.execute('STORE order FOR ctx_9 PAYLOAD {"amount": 999, "region": "DE"}')
    return engine


def test_segment_report(populated):
    from sneldb_spark.store.inspect import segment_report

    rep = segment_report(populated.store.root)
    assert "order" in rep["event_types"]
    seg = rep["event_types"]["order"]
    assert seg["rows"] == 10  # flushed rows only; the WAL tail is not a segment
    assert seg["files"] >= 1 and seg["bytes"] > 0
    # ts envelope comes from footer stats and must bracket the test clock
    assert seg["ts_min"] is not None and seg["ts_max"] >= seg["ts_min"]
    assert seg["event_id_max"] > seg["event_id_min"]


def test_footer_and_column_reports(populated):
    from sneldb_spark.store.inspect import (
        _parquet_files,
        column_report,
        footer_report,
    )

    seg_dir = os.path.join(populated.store.root, "events", "order")
    files = _parquet_files(seg_dir)
    assert files
    rep = footer_report(files[0])
    assert rep["num_rows"] >= 1 and rep["num_row_groups"] >= 1
    names = {c["name"] for c in rep["schema"]}
    assert {"timestamp", "event_id", "context_id"} <= names
    first_rg = rep["row_groups"][0]
    assert "amount" in first_rg["columns"]
    st = first_rg["columns"]["amount"]["stats"]
    assert st["min"] is not None and st["max"] >= st["min"]

    col = column_report(seg_dir, "amount")
    assert col["chunks"]
    # the pruning envelope across all chunks covers every stored value
    assert min(c["min"] for c in col["chunks"]) == 0
    assert max(c["max"] for c in col["chunks"]) == 90
    # unknown field -> empty, not an error
    assert column_report(seg_dir, "nope")["chunks"] == []


def test_wal_report_shows_unflushed_tail(populated):
    from sneldb_spark.store.inspect import wal_report

    rep = wal_report(populated.store.root)
    assert rep["files"], "one WAL file should hold the post-FLUSH row"
    total = sum(f["entries"] for f in rep["files"])
    assert total == 1
    assert rep["files"][0]["by_type"] == {"order": 1}
    assert rep["files"][0]["corrupt_lines"] == 0


def test_materialized_report(populated):
    from sneldb_spark.store.inspect import materialized_report

    rep = materialized_report(populated.store.root)
    mat = rep["materializations"]["big_orders"]
    assert mat["kind"] == "segment"
    assert mat["event_type"] == "order"
    assert mat["rows"] == 5  # amounts 50..90
    assert mat["hwm_ts"] is not None


def test_cli_json_output(populated, capsys):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
    from inspector import main as cli_main  # tools/inspector.py

    rc = cli_main(["inspector", "segments", populated.store.root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["event_types"]["order"]["rows"] == 10

    rc = cli_main(["inspector", "materialized", populated.store.root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "big_orders" in out["materializations"]

    assert cli_main(["inspector"]) == 2
    assert cli_main(["inspector", "bogus", "x"]) == 2
