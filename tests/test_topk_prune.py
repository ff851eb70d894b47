"""Top-k file skipping (ORDER BY + LIMIT; the reference's RLTE zone index
re-expressed over Parquet footer stats — store/topk_prune.py)."""

import pytest
from pyspark.sql import functions as F

from sneldb_spark.store.topk_prune import FileStat, select_topk_files


def _stat(path, rows, cmin, cmax, nulls=0):
    return FileStat(path, rows, cmin, cmax, nulls)


def test_select_desc_prunes_low_files():
    stats = [
        _stat("a", 10, 0, 9),
        _stat("b", 10, 10, 19),
        _stat("c", 10, 20, 29),
    ]
    keep, bound = select_topk_files(stats, 5, desc=True)
    assert keep == ["c"] and bound == 20
    # needing more rows than the best file holds widens the keep set
    keep, bound = select_topk_files(stats, 15, desc=True)
    assert keep == ["b", "c"] and bound == 10


def test_select_asc_prunes_high_files():
    stats = [
        _stat("a", 10, 0, 9),
        _stat("b", 10, 10, 19),
        _stat("c", 10, 20, 29),
    ]
    keep, bound = select_topk_files(stats, 5, desc=False)
    assert keep == ["a"] and bound == 9


def test_select_overlapping_ranges_kept():
    # file "lo" overlaps the bound range and must survive a DESC prune
    stats = [
        _stat("lo", 100, 0, 25),
        _stat("hi", 10, 20, 30),
    ]
    keep, _ = select_topk_files(stats, 5, desc=True)
    assert keep == ["lo", "hi"]


def test_select_insufficient_guarantee_keeps_all():
    stats = [_stat("a", 3, 0, 9), _stat("b", 3, 10, 19)]
    keep, bound = select_topk_files(stats, 100, desc=True)
    assert keep == ["a", "b"] and bound is None


def test_select_missing_stats_never_pruned():
    stats = [
        _stat("known", 10, 10, 19),
        _stat("mystery", 10, None, None),
    ]
    keep, _ = select_topk_files(stats, 5, desc=True)
    assert "mystery" in keep


def test_select_asc_keeps_null_bearing_files():
    # Spark sorts nulls FIRST ascending: a null-bearing file can hold a
    # top-n row no matter its value range, and its null rows must not
    # count toward the guarantee.
    stats = [
        _stat("low", 10, 0, 9),
        _stat("high_with_nulls", 10, 100, 200, nulls=4),
    ]
    keep, _ = select_topk_files(stats, 5, desc=False)
    assert keep == ["low", "high_with_nulls"]
    # under DESC the same nulls sort last; the file prunes normally and
    # its null rows don't inflate the guarantee
    stats = [
        _stat("low_with_nulls", 10, 0, 9, nulls=8),
        _stat("high", 10, 100, 200),
    ]
    keep, _ = select_topk_files(stats, 5, desc=True)
    assert keep == ["high"]


@pytest.fixture(scope="module")
def topk_db(spark, tmp_path_factory):
    """Engine with one event type spread over several date partitions —
    multiple parquet files with disjoint timestamp ranges."""
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path_factory.mktemp("topk_db"))
    db = SnelDB(spark, root)
    db.store.registry.define("reading", {"v": "int"})
    day = 86_400
    base = 1_700_000_000
    rows = []
    for d in range(6):
        for i in range(20):
            ts = base + d * day + i
            rows.append(("c%d" % (i % 3), "reading", ts, d * 100 + i, d * 100 + i))
    frame = spark.createDataFrame(
        rows, ["context_id", "event_type", "timestamp", "event_id", "v"]
    )
    db.store.append_dataframe("reading", frame)
    return db


def test_engine_topk_prunes_files_and_matches_full_scan(topk_db, spark):
    from sneldb_spark.commands.parser import parse_command
    from sneldb_spark.plans.compiler import QueryCompiler

    q = "QUERY reading ORDER BY timestamp DESC LIMIT 5"
    pruned = topk_db.query(q)
    full = QueryCompiler(
        source=topk_db.store.read,
        schema_lookup=topk_db.compiler._schema,
        time_config=topk_db.compiler.time_config,
    ).compile_query(parse_command(q))
    assert [r.asDict() for r in pruned.collect()] == [
        r.asDict() for r in full.collect()
    ]

    # IO check: the pruned source touches fewer files than exist
    src = topk_db.store.read_topk("reading", "timestamp", 5, desc=True)
    total_files = (
        topk_db.store.read("reading").select(F.input_file_name()).distinct().count()
    )
    pruned_files = src.select(F.input_file_name()).distinct().count()
    assert pruned_files < total_files
    # and still contains every top-5 row
    top = [r["event_id"] for r in pruned.collect()]
    assert len(top) == 5


def test_engine_topk_includes_pending_memtable_rows(topk_db):
    # an unflushed STORE with the newest timestamp must win a DESC top-k
    topk_db.store.store("reading", "cx", {"v": 7}, timestamp=1_800_000_000)
    try:
        got = topk_db.query("QUERY reading ORDER BY timestamp DESC LIMIT 1")
        assert [r["timestamp"] for r in got.collect()] == [1_800_000_000]
    finally:
        with topk_db.store._pending_lock:
            topk_db.store._pending.clear()


def test_topk_not_applied_with_filters(topk_db):
    # a WHERE-filtered ORDER BY+LIMIT must fall back to the full scan
    # (footer bounds count unfiltered rows; pruning would be unsound)
    from sneldb_spark.commands.parser import parse_command

    q_ast = parse_command(
        "QUERY reading WHERE v < 10 ORDER BY timestamp DESC LIMIT 3"
    )
    assert topk_db.compiler._topk_frame(q_ast) is None
    got = topk_db.query("QUERY reading WHERE v < 10 ORDER BY timestamp DESC LIMIT 3")
    # v<10 only exists on day 0 (v == second offset there): newest three
    assert [r["v"] for r in got.collect()] == [9, 8, 7]
