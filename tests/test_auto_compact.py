"""Flush-triggered auto-compaction ([storage] auto_compact_files — the
reference's background compactor as a write-path policy): file count
shrinks past the threshold, data survives byte-for-byte, off by default."""

import glob
import os

import pytest


def _n_files(store, t):
    # resolve() — on the (default) grace backend a compaction publish
    # lands in a versioned sibling prefix and spares the superseded copy
    # for in-flight readers; the LIVE file count is the converged one
    live = store.storage.resolve(os.path.join(store.root, "events", t))
    return len(glob.glob(os.path.join(live, "**", "*.parquet"), recursive=True))


def test_auto_compact_triggers_and_preserves_data(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"), auto_compact_files=3)
    db.execute('DEFINE t FIELDS { "v": "int" }')
    for i in range(6):
        db.execute(f'STORE t FOR c{i} PAYLOAD {{"v": {i}}}')
        db.execute("FLUSH")  # one file per flush
    # compaction is a BACKGROUND worker (reference compaction_worker.rs;
    # FLUSH only enqueues) — settle it before asserting convergence
    assert db.store.quiesce_compaction() == []
    # the compactor fired at least once: far fewer than 6 files remain
    assert _n_files(db.store, "t") <= 3
    rows = db.query("QUERY t ORDER BY v").collect()
    assert [r["v"] for r in rows] == list(range(6))
    # no staging/old leftovers
    leftovers = [
        n
        for n in os.listdir(os.path.join(db.store.root, "events"))
        if n.endswith((".staging", ".old"))
    ]
    assert leftovers == []


def test_auto_compact_off_by_default(spark, tmp_path):
    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"))
    db.execute('DEFINE t FIELDS { "v": "int" }')
    for i in range(5):
        db.execute(f'STORE t FOR c{i} PAYLOAD {{"v": {i}}}')
        db.execute("FLUSH")
    assert _n_files(db.store, "t") == 5  # untouched


def test_config_key(tmp_path):
    from sneldb_spark.config import load_config

    cfg = load_config(
        {"data_dir": str(tmp_path), "storage": {"auto_compact_files": 64}}
    )
    assert cfg.auto_compact_files == 64
    assert load_config({"data_dir": str(tmp_path)}).auto_compact_files is None
    # 0 means off, not "compact at zero files"
    cfg0 = load_config({"data_dir": str(tmp_path), "storage": {"auto_compact_files": 0}})
    assert cfg0.auto_compact_files is None


def test_extensions_config_section(spark, tmp_path):
    from sneldb_spark.config import create_engine, load_config

    cfg = load_config({
        "engine": {"data_dir": str(tmp_path / "x")},
        "extensions": {
            "approx_count_unique": True,
            "approx_percentiles": True,
            "sequence_slices": 8,
            "multi_link": True,
        },
    })
    assert (cfg.approx_count_unique, cfg.approx_percentiles,
            cfg.sequence_slices, cfg.multi_link) == (True, True, 8, True)
    db = create_engine(spark, cfg)
    assert db.compiler.approx_percentiles and db.compiler.multi_link
    assert db.compiler.sequence_slices == 8
    # defaults stay off
    cfg2 = load_config({"engine": {"data_dir": str(tmp_path / "y")}})
    assert not cfg2.approx_count_unique and cfg2.sequence_slices == 0


def test_auto_compact_with_wal_recovery(spark, tmp_path):
    """Crash-with-pending-WAL then reopen on an auto-compacting root:
    replayed rows flush + compact without losing anything."""
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path / "db")
    db = SnelDB(spark, root, auto_compact_files=2)
    db.execute('DEFINE t FIELDS { "v": "int" }')
    for i in range(3):
        db.execute(f'STORE t FOR a{i} PAYLOAD {{"v": {i}}}')
        db.execute("FLUSH")
    db.execute('STORE t FOR crash PAYLOAD {"v": 99}')  # pending, not flushed

    db2 = SnelDB(spark, root, auto_compact_files=2)  # takes over + replays WAL
    db2.execute("FLUSH")
    rows = sorted(r["v"] for r in db2.query("QUERY t").collect())
    assert rows == [0, 1, 2, 99]
    assert db2.store.quiesce_compaction() == []
    assert _n_files(db2.store, "t") <= 2


def test_periodic_compaction_interval_converges(spark, tmp_path):
    """[engine] compaction_interval (reference config/prod.toml:20,
    compaction_worker.rs): once the interval elapses, the next write
    barrier sweeps every type over the file-count floor — segment count
    converges WITHOUT any explicit compact() call, and data survives."""
    from sneldb_spark.engine import SnelDB

    t = [1_000_000]  # injectable clock: epoch seconds

    db = SnelDB(spark, str(tmp_path / "db"), clock=lambda: t[0],
                compaction_interval=600)
    db.execute('DEFINE p FIELDS { "v": "int" }')
    for i in range(10):  # one file per flush, inside one interval
        db.execute(f'STORE p FOR c{i} PAYLOAD {{"v": {i}}}')
        db.execute("FLUSH")
    assert _n_files(db.store, "p") == 10  # interval not elapsed: untouched
    t[0] += 601
    db.execute('STORE p FOR cx PAYLOAD {"v": 99}')
    db.execute("FLUSH")  # the write barrier after the interval sweeps
    assert db.store.quiesce_compaction() == []
    assert _n_files(db.store, "p") <= 3
    rows = db.query("QUERY p ORDER BY v").collect()
    assert [r["v"] for r in rows] == list(range(10)) + [99]
    # next sweep is threshold-gated: a converged dir is not rewritten
    t[0] += 601
    before = sorted(
        glob.glob(os.path.join(db.store.root, "events", "p", "**", "*.parquet"),
                  recursive=True)
    )
    assert db.query("QUERY p").count() == 11  # read-path check, no-op sweep
    assert db.store.quiesce_compaction() == []
    after = sorted(
        glob.glob(os.path.join(db.store.root, "events", "p", "**", "*.parquet"),
                  recursive=True)
    )
    assert before == after


def test_periodic_compaction_config_key(tmp_path):
    from sneldb_spark.config import load_config

    cfg = load_config(
        {"engine": {"data_dir": str(tmp_path), "compaction_interval": 600}}
    )
    assert cfg.compaction_interval == 600
    assert load_config({"engine": {"data_dir": str(tmp_path)}}).compaction_interval is None
    cfg0 = load_config(
        {"engine": {"data_dir": str(tmp_path), "compaction_interval": 0}}
    )
    assert cfg0.compaction_interval is None


def test_hold_compaction_defers_background_rewrites(spark, tmp_path):
    """While a hold is active (the REMEMBER bootstrap takes one), the
    background worker must start no rewrite; release lets the deferred
    queue run. Guards the on_snapshot-overlap contract: a compaction
    publish deletes the superseded live copy, which would fail the
    bootstrap's in-flight source reads."""
    import time

    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"), auto_compact_files=2)
    db.execute('DEFINE t FIELDS { "v": "int" }')
    with db.store.hold_compaction():
        for i in range(5):
            db.execute(f'STORE t FOR c{i} PAYLOAD {{"v": {i}}}')
            db.execute("FLUSH")  # one file per flush; enqueues past 2
        # the worker must not converge the directory while held
        deadline = time.time() + 3
        while time.time() < deadline and not db.store._compact_queue:
            time.sleep(0.05)  # enqueue is synchronous on FLUSH, settle
        assert _n_files(db.store, "t") >= 5
        assert db.store._compact_inflight is None
    # release: the deferred rewrite runs and converges
    assert db.store.quiesce_compaction() == []
    assert _n_files(db.store, "t") <= 2
    rows = db.query("QUERY t ORDER BY v").collect()
    assert [r["v"] for r in rows] == list(range(5))


def test_remember_bootstrap_overlap_with_compaction_is_exact(spark, tmp_path):
    """End-to-end: an on_snapshot-overlapped ingest that crosses the
    compaction threshold mid-bootstrap must neither fail the bootstrap's
    reads nor change the result: REMEMBER reflects rows at-or-below its
    mark, the overlapped rows fold into the next SHOW exactly once."""
    import threading

    from sneldb_spark.engine import SnelDB

    db = SnelDB(spark, str(tmp_path / "db"), auto_compact_files=2)
    db.execute('DEFINE t FIELDS { "v": "int" }')
    for i in range(4):  # above the threshold already: bootstrap reads many files
        db.execute(f'STORE t FOR c{i} PAYLOAD {{"v": {i}}}')
        db.execute("FLUSH")

    def overlapped():
        for i in range(4, 8):
            db.execute(f'STORE t FOR c{i} PAYLOAD {{"v": {i}}}')
            db.execute("FLUSH")  # enqueues compaction mid-bootstrap

    t = threading.Thread(target=overlapped)
    db.materializer.on_snapshot = t.start
    try:
        db.execute("REMEMBER QUERY t WHERE v >= 0 AS all_t")
        t.join()
    finally:
        db.materializer.on_snapshot = None
    out = sorted(r["v"] for r in db.execute("SHOW all_t").df.collect())
    assert out == list(range(8))
    assert db.store.quiesce_compaction() == []
    assert db.materializer.quiesce() == []
