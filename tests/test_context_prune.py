"""FOR/REPLAY context file skipping (footer min/max point-lookup pruning
over the range-placed (context_id, timestamp) file layout —
store/topk_prune.py select_context_files + EventStore.read_for_context)."""

import pytest
from pyspark.sql import functions as F

from sneldb_spark.store.topk_prune import FileStat, select_context_files


def _stat(path, rows, cmin, cmax, nulls=0):
    return FileStat(path, rows, cmin, cmax, nulls)


def test_select_context_keeps_only_covering_ranges():
    stats = [
        _stat("a", 10, "c00", "c33"),
        _stat("b", 10, "c34", "c66"),
        _stat("c", 10, "c67", "c99"),
    ]
    assert select_context_files(stats, "c50") == ["b"]
    # boundary values stay in
    assert select_context_files(stats, "c34") == ["b"]
    # outside every range: nothing to scan
    assert select_context_files(stats, "d01") == []


def test_select_context_overlapping_and_unknown_kept():
    stats = [
        _stat("tight", 10, "c40", "c60"),
        _stat("wide", 10, "a00", "z99"),
        _stat("mystery", 10, None, None),
    ]
    assert select_context_files(stats, "c50") == ["tight", "wide", "mystery"]


def test_select_context_incomparable_stats_never_prune():
    stats = [_stat("ints", 10, 1, 9)]
    assert select_context_files(stats, "c1") == ["ints"]


@pytest.fixture(scope="module")
def ctx_db(spark, tmp_path_factory):
    """Engine with 200 contexts range-placed across several files."""
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path_factory.mktemp("ctx_db"))
    db = SnelDB(spark, root)
    db.store.registry.define("visit", {"v": "int"})
    base = 1_700_000_000
    rows = [
        ("u%03d" % c, "visit", base + c * 10 + i, c * 10 + i, c * 10 + i)
        for c in range(200)
        for i in range(3)
    ]
    frame = spark.createDataFrame(
        rows, ["context_id", "event_type", "timestamp", "event_id", "v"]
    )
    # tiny test data: AQE would coalesce the range shuffle to one file.
    # At scale coalescing merges ADJACENT ranges (contiguity survives);
    # here we disable it so the fixture actually spans multiple files.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        db.store.append_dataframe("visit", frame)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    return db


def test_for_query_prunes_files_and_matches_full_scan(ctx_db):
    from sneldb_spark.commands.parser import parse_command
    from sneldb_spark.plans.compiler import QueryCompiler

    q = "QUERY visit FOR u123"
    pruned = ctx_db.query(q)
    full = QueryCompiler(
        source=ctx_db.store.read,
        schema_lookup=ctx_db.compiler._schema,
        time_config=ctx_db.compiler.time_config,
    ).compile_query(parse_command(q))
    assert sorted(r["event_id"] for r in pruned.collect()) == sorted(
        r["event_id"] for r in full.collect()
    ) == [1230, 1231, 1232]

    total = ctx_db.store.read("visit").select(F.input_file_name()).distinct().count()
    assert total > 1, "fixture must span multiple files"
    src = ctx_db.store.read_for_context("visit", "u123")
    touched = src.select(F.input_file_name()).distinct().count()
    assert touched < total


def test_replay_prunes_and_preserves_order(ctx_db):
    got = ctx_db.query("REPLAY visit FOR u007")
    assert [r["event_id"] for r in got.collect()] == [70, 71, 72]


def test_for_prune_includes_pending_memtable_rows(ctx_db):
    ctx_db.store.store("visit", "u123", {"v": 999}, timestamp=1_900_000_000)
    try:
        got = ctx_db.query("QUERY visit FOR u123")
        assert sorted(r["v"] for r in got.collect()) == [1230, 1231, 1232, 999][
            :
        ] or sorted(r["v"] for r in got.collect()) == sorted([1230, 1231, 1232, 999])
    finally:
        with ctx_db.store._pending_lock:
            ctx_db.store._pending.clear()


def test_for_prune_safe_under_where_and_since(ctx_db):
    # context pruning keeps a superset, so extra filters stay correct
    got = ctx_db.query("QUERY visit FOR u123 WHERE v > 1230")
    assert sorted(r["v"] for r in got.collect()) == [1231, 1232]


def test_unknown_context_scans_nothing_but_returns_empty(ctx_db):
    src = ctx_db.store.read_for_context("visit", "zz_not_there")
    assert src.count() == 0
    assert ctx_db.query("QUERY visit FOR zz_not_there").count() == 0
