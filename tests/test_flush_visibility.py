"""Visibility across the flush commit window (soak-found regression).

FLUSH swaps the memtable out and commits Parquet OUTSIDE the pending
lock; before the `_flushing` buffer existed, the swapped rows were
invisible to reads and to the hwm probe for the whole commit window
(seconds under load). For plain QUERYs that was a transient visibility
dip; for the incremental materializer it was PERMANENT row loss: a SHOW
whose hwm probe ran before the dip and whose delta frame built during
it advanced the high-water mark past rows it never counted
(soak-reproduced: 108k of 580k rows missing from a COUNT BY
materialization at 13k ev/s).

Invariants pinned here:
  V1 rows stay queryable at every instant of the commit window
  V2 the hwm probe never regresses during the window
  V3 an incremental SHOW racing the window stays exact
  V4 no duplicates once the commit lands (handover epoch guard)
"""

import threading

import pytest


def _pause_commit(store):
    """Instrument store._write_rows to block mid-commit until released.
    Returns (entered, release) events."""
    entered, release = threading.Event(), threading.Event()
    orig = store._write_rows

    def slow(event_type, rows):
        entered.set()
        assert release.wait(30), "test deadlock: commit gate never released"
        orig(event_type, rows)

    store._write_rows = slow
    return entered, release


def test_rows_queryable_and_probe_stable_during_commit_window(engine):
    engine.execute('DEFINE vis FIELDS { "n": "int" }')
    for i in range(10):
        engine.execute(f'STORE vis FOR c{i} PAYLOAD {{ "n": {i} }}')
    hwm_before = engine.store.source_hwm("vis")
    entered, release = _pause_commit(engine.store)
    t = threading.Thread(target=engine.store.flush)
    t.start()
    try:
        assert entered.wait(30)
        # V1: mid-commit, the batch is neither in the memtable nor in
        # any segment file — it must still be fully queryable
        assert engine.query("QUERY vis").count() == 10
        assert engine.query("QUERY vis TOTAL n").collect()[0]["total_n"] == 45
        # V2: the probe must not regress below the pre-flush marks
        assert engine.store.source_hwm("vis") == hwm_before
    finally:
        release.set()
        t.join()
    # V4: after the handover, exactly once
    assert engine.query("QUERY vis").count() == 10
    assert engine.store.source_hwm("vis") == hwm_before


def test_incremental_show_racing_commit_window_stays_exact(engine):
    engine.execute('DEFINE vm FIELDS { "k": "string" }')
    for i in range(6):
        engine.execute(f'STORE vm FOR c{i} PAYLOAD {{ "k": "k{i % 2}" }}')
    engine.execute("FLUSH")
    engine.execute("REMEMBER QUERY vm COUNT BY k AS vm_counts")
    # second wave arrives, and its FLUSH stalls mid-commit
    for i in range(6, 14):
        engine.execute(f'STORE vm FOR c{i} PAYLOAD {{ "k": "k{i % 2}" }}')
    entered, release = _pause_commit(engine.store)
    t = threading.Thread(target=engine.store.flush)
    t.start()
    try:
        assert entered.wait(30)
        # V3: SHOW's probe + delta both run inside the commit window
        # (bypass engine.execute - its own flush would block on the
        # flush lock the paused flush holds)
        shown = {
            r["k"]: r["count"]
            for r in engine.materializer.show("vm_counts").collect()
        }
        assert shown == {"k0": 7, "k1": 7}
    finally:
        release.set()
        t.join()
    # after the window closes the counts must hold (no loss, no dupes)
    shown = {r["k"]: r["count"] for r in engine.execute("SHOW vm_counts").df.collect()}
    assert shown == {"k0": 7, "k1": 7}
    # and rows that arrive later still merge exactly once
    engine.execute('STORE vm FOR c99 PAYLOAD { "k": "k0" }')
    shown = {r["k"]: r["count"] for r in engine.execute("SHOW vm_counts").df.collect()}
    assert shown == {"k0": 8, "k1": 7}


def test_failed_commit_requeues_only_uncommitted_types(engine, monkeypatch):
    """A flush that dies after committing type A but before type B must
    re-queue ONLY B's rows (A would duplicate on the retry flush)."""
    engine.execute('DEFINE fa FIELDS { "n": "int" }')
    engine.execute('DEFINE fb FIELDS { "n": "int" }')
    engine.execute('STORE fa FOR c1 PAYLOAD { "n": 1 }')
    engine.execute('STORE fb FOR c1 PAYLOAD { "n": 2 }')
    store = engine.store
    orig = store._write_rows

    # type commits run in PARALLEL (flush shards by type), so failure
    # injection keys on the type, not on commit order
    def die_on_fb(event_type, rows):
        if event_type == "fb":
            raise RuntimeError("simulated commit failure")
        orig(event_type, rows)

    store._write_rows = die_on_fb
    with pytest.raises(RuntimeError):
        store.flush()
    store._write_rows = orig
    ok_type, other = "fa", "fb"
    # the committed type's rows are NOT back in the buffer
    assert not store._has_pending(ok_type)
    assert store._has_pending(other)
    store.flush()  # retry commits the failed type
    assert engine.query(f"QUERY {ok_type}").count() == 1
    assert engine.query(f"QUERY {other}").count() == 1
