"""Memtable capacity, admission backpressure, and the server's
retry-later rejection (reference parity):

  - capacity-triggered ASYNC flush: src/engine/store/insert.rs
    insert_and_maybe_flush — a full memtable rotates out and a flush
    worker drains it; ingest never waits for an external FLUSH cadence.
  - hard admission bound: max_inflight_passives / FlowChannel::bounded —
    pending rows are bounded by construction, so the serve path's
    memtable-union term (and driver memory) can't grow without bound.
  - frontend rejection: [server] backpressure_threshold
    (config/prod.toml:40, src/frontend/server_state.rs +
    tcp/listener.rs:302) — writes get "Server is under pressure, please
    retry later" instead of queueing into a saturated memtable.
  - background compaction never loses concurrent appends: the worker
    rewrites a SNAPSHOT of the file listing off the flush lock, then
    adopts files appended mid-rewrite before its publish flip
    (event_store.py _compact_concurrent).
"""

import threading
import time

import pytest


@pytest.fixture(scope="module")
def spark():
    from sneldb_spark.session import get_spark

    return get_spark(app_name="bp-tests", master="local[4]",
                     shuffle_partitions=4)


def _mk(spark, tmp_path, **kw):
    from sneldb_spark.engine import SnelDB

    return SnelDB(spark, str(tmp_path / "db"), **kw)


def _wait(pred, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_capacity_triggers_async_flush(spark, tmp_path):
    """Crossing memtable_capacity fires a background flush with no
    FLUSH command anywhere: pending drains to Parquet on its own."""
    db = _mk(spark, tmp_path, memtable_capacity=20)
    db.execute('DEFINE ev FIELDS { "n": "int" }')
    for i in range(25):
        db.execute(f'STORE ev FOR c{i} PAYLOAD {{"n": {i}}}')
    assert _wait(lambda: db.store._pending_total() < 20)
    # every row queryable (some from segments, any remainder from memtable)
    assert db.query("QUERY ev").count() == 25
    db.close()


def test_admission_bound_holds_single_writer(spark, tmp_path):
    """A writer can never observe pending above the hard bound
    (capacity * 4): _admit_row blocks until the async flush frees
    space. All rows land; nothing is dropped while blocked."""
    cap = 10
    db = _mk(spark, tmp_path, memtable_capacity=cap)
    hard = cap * db.store._MAX_PENDING_FACTOR
    db.execute('DEFINE ev FIELDS { "n": "int" }')
    worst = 0
    for i in range(120):
        db.execute(f'STORE ev FOR c{i % 7} PAYLOAD {{"n": {i}}}')
        worst = max(worst, db.store._pending_total())
    assert worst <= hard
    db.store.flush()
    assert db.query("QUERY ev").count() == 120
    db.close()


def test_server_rejects_writes_under_pressure(spark, tmp_path):
    """With the flush pipeline wedged (flush lock held by the test),
    pending grows past threshold% of the hard bound and the TCP
    frontend answers the reference's retry-later error for STOREs —
    while reads keep flowing. Releasing the lock drains the backlog
    and writes are accepted again."""
    from sneldb_spark.client import SnelDBClient
    from sneldb_spark.server import SnelDBServer

    cap = 10  # hard bound 40; reject at 90% = 36
    db = _mk(spark, tmp_path, memtable_capacity=cap)
    server = SnelDBServer(db).start()
    host, port = server.address
    try:
        with SnelDBClient(f"tcp://{host}:{port}") as c:
            c.execute('DEFINE ev FIELDS { "n": "int" }')
            db.store._flush_lock.acquire()  # wedge the flush pipeline
            try:
                rejected = None
                for i in range(40):
                    r = c.try_execute(
                        f'STORE ev FOR c{i} PAYLOAD {{"n": {i}}}'
                    )
                    if not r.ok:
                        rejected = (i, r.message)
                        break
                assert rejected is not None, "never rejected"
                assert "under pressure" in rejected[1]
                # reads are NOT gated (deviation from the reference,
                # documented in reject_if_under_pressure): probes flow
                assert c.try_execute("QUERY ev COUNT").ok
            finally:
                db.store._flush_lock.release()
            # the wedge gone, the async flush drains and writes resume
            assert _wait(
                lambda: c.try_execute(
                    'STORE ev FOR cz PAYLOAD {"n": 999}'
                ).ok,
                timeout=60.0,
            )
            db.store.flush()
            # accepted rows = rejected[0] stores + the post-drain one
            assert db.query("QUERY ev").count() == rejected[0] + 1
    finally:
        server.stop()
        db.close()


def test_background_compaction_keeps_concurrent_appends(spark, tmp_path):
    """Flushes landing DURING a whole-type rewrite survive the publish:
    the worker adopts post-snapshot files under the flush lock before
    flipping (the flip without the adopt silently drops them — their
    WAL is already retired)."""
    db = _mk(spark, tmp_path)  # no auto-compact: we drive the worker
    db.execute('DEFINE ev FIELDS { "n": "int" }')
    for i in range(6):
        db.execute(f'STORE ev FOR c{i} PAYLOAD {{"n": {i}}}')
        db.execute("FLUSH")

    done = threading.Event()
    err: list = []

    def compact():
        try:
            db.store._compact_concurrent("ev")
        except Exception as e:  # pragma: no cover
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=compact)
    t.start()
    # keep appending while the rewrite runs; at least the appends that
    # land inside the rewrite window exercise the adopt path
    n = 6
    while not done.is_set() and n < 60:
        db.execute(f'STORE ev FOR c{n} PAYLOAD {{"n": {n}}}')
        db.execute("FLUSH")
        n += 1
    t.join()
    assert not err
    vals = sorted(r["n"] for r in db.query("QUERY ev").collect())
    assert vals == list(range(n))  # nothing lost to the flip
    db.close()


def test_superseded_engine_never_publishes_compaction(spark, tmp_path):
    """A takeover while the old engine's worker is mid-rewrite: the old
    worker must abort before its publish (it would flip the pointer
    under the new owner)."""
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path / "db")
    db = SnelDB(spark, root)
    db.execute('DEFINE ev FIELDS { "n": "int" }')
    for i in range(4):
        db.execute(f'STORE ev FOR c{i} PAYLOAD {{"n": {i}}}')
        db.execute("FLUSH")
    raw = db.store._raw_path("ev")
    before = db.store.storage.resolve(raw)

    db2 = SnelDB(spark, root)  # takeover stops db's workers
    assert db.store._superseded
    # a rewrite attempted on the superseded engine aborts pre-publish
    db.store._compact_concurrent("ev")
    assert db2.store.storage.resolve(raw) == before  # no flip happened
    assert db2.query("QUERY ev").count() == 4
    db2.close()


def test_memtable_capacity_config_keys(tmp_path):
    from sneldb_spark.config import load_config

    # reference sizing keys opt in: fill_factor * event_per_zone * shards
    cfg = load_config({
        "engine": {"data_dir": str(tmp_path), "fill_factor": 4,
                   "event_per_zone": 8000, "shard_count": 8},
    })
    assert cfg.memtable_capacity == 4 * 8000 * 8
    # bare config: library default, no capacity
    assert load_config(
        {"engine": {"data_dir": str(tmp_path)}}
    ).memtable_capacity is None
    # [server] backpressure_threshold
    cfg2 = load_config({
        "engine": {"data_dir": str(tmp_path)},
        "server": {"tcp_addr": "127.0.0.1:0", "backpressure_threshold": 75},
    })
    assert cfg2.server.backpressure_threshold == 75
