"""Object-store backend under REAL object-store semantics: injected
transient errors (500/503/timeout, both "op lost" and "op landed,
response lost"), request latency, paged non-snapshot listings, a
systematic crash-point sweep over every client round trip of the
publish/recover protocol, and concurrent readers racing pointer flips.

This is the suite that takes `ObjectStoreStorage` off the
perfect-filesystem fake: `DirObjectClient` is wrapped in
`FaultInjectingObjectClient` (the failure model) and
`RetryingObjectClient` (the SDK-retry role). Idempotence arguments for
retry safety live on RetryingObjectClient's docstring; the GC grace
window for in-flight readers is `ObjectStoreStorage(gc_grace_versions=)`.
Reference parity note: the reference engine is local-disk only
(src/engine/core/segment/); this matrix is the lake-deployment story.
"""

import os
import random
import threading

import pytest

from sneldb_spark.store.storage import (
    DirObjectClient,
    FaultInjectingObjectClient,
    ObjectStoreStorage,
    ObjectStoreTransientError,
    RetryingObjectClient,
)


class SimulatedCrash(BaseException):
    """Process death mid-protocol (BaseException so no except Exception
    handler in the code under test can swallow it)."""


N_PARTS = 3  # data objects per copy (multi-object copies catch torn GC)


def _write_copy(client, prefix, gen):
    for i in range(N_PARTS):
        client.put(os.path.join(prefix, f"part{i}.parquet"), f"g{gen}:{i}".encode())


def _live_generation(ost, dst):
    """Read the live copy; return its generation if complete and
    untorn, else fail the test."""
    live = ost.resolve(dst)
    keys = sorted(ost.client.list(live.rstrip("/") + "/"))
    names = [os.path.basename(k) for k in keys]
    assert names == [f"part{i}.parquet" for i in range(N_PARTS)], (
        f"live copy at {live} incomplete: {names}"
    )
    gens = {ost.client.get(k).decode().split(":")[0] for k in keys}
    assert len(gens) == 1, f"torn copy (mixed generations): {gens}"
    return gens.pop()


def _episode(client, dst, gens=(1, 2), completed=None):
    """The scripted protocol episode the crash sweep replays: publish
    generation after generation through a storage on `client`.
    `completed` (if given) records each generation whose publish_dir
    RETURNED before a crash."""
    ost = ObjectStoreStorage(client)
    for g in gens:
        staging = ost.stage_path(dst)
        _write_copy(client, staging, g)
        ost.publish_dir(dst)
        if completed is not None:
            completed.append(g)
    return ost


# -- crash-point sweep ----------------------------------------------------


def _count_ops(tmp_path, name):
    counter = FaultInjectingObjectClient(
        DirObjectClient(str(tmp_path / name)), crash_exc=SimulatedCrash
    )
    _episode(counter, str(tmp_path / name / "data"))
    return counter.op_count


def test_crash_sweep_every_op_every_side_recovers(tmp_path):
    """Kill the process at EVERY client round trip of a two-generation
    publish episode, both before the op reaches the server and after it
    lands; after recovery the live copy must be untorn (never mixes
    generations) and at least as new as the last ACKNOWLEDGED publish —
    the object-store analogue of the local crash matrix, exhaustive over
    interleavings. Crashes before the first publish ever completed may
    leave a partial promoted staging (the documented caller-rederives
    contract, same as the local '.staging only' row) or nothing at all;
    either way a follow-up publish must land cleanly."""
    total = _count_ops(tmp_path, "probe")
    assert total > 10  # the sweep is actually sweeping something
    for k in range(1, total + 1):
        for side in ("before", "after"):
            root = str(tmp_path / f"b{k}{side[0]}")
            dst = os.path.join(root, "data")
            faulty = FaultInjectingObjectClient(
                DirObjectClient(root),
                fail_at_op=k,
                fail_side=side,
                crash_exc=SimulatedCrash,
            )
            completed = []
            with pytest.raises(SimulatedCrash):
                _episode(faulty, dst, completed=completed)
            # fresh process: clean client, recover, then check invariants
            client = DirObjectClient(root)
            ost = ObjectStoreStorage(client)
            ost.recover_dir(dst)
            ost.recover_dir(dst)  # idempotent
            live = ost.resolve(dst)
            keys = sorted(client.list(live.rstrip("/") + "/"))
            names = [os.path.basename(k2) for k2 in keys]
            assert set(names) <= {f"part{i}.parquet" for i in range(N_PARTS)}
            gens = {client.get(k2).decode().split(":")[0] for k2 in keys}
            assert len(gens) <= 1, f"torn copy (mixed generations): {gens}"
            if completed:
                # an acknowledged publish is durable: complete copy, at
                # least as new as the last acked generation
                assert len(names) == N_PARTS
                assert gens and int(gens.pop()[1:]) >= max(completed)
            # and the store keeps working: a follow-up publish lands gen 3
            staging = ost.stage_path(dst)
            _write_copy(client, staging, 3)
            ost.publish_dir(dst)
            assert _live_generation(ost, dst) == "g3"


def test_crash_sweep_inside_recovery_itself(tmp_path):
    """Recovery is re-entrant under its own crashes: crash the first
    recovery at every round trip, run a second (clean) recovery, same
    invariants. Pins that recover_dir never makes things worse."""
    # set up a crashed first-publish state: staged copy, no pointer yet
    root = str(tmp_path / "base")
    dst = os.path.join(root, "data")
    setup = DirObjectClient(root)
    ost0 = ObjectStoreStorage(setup)
    _write_copy(setup, ost0.stage_path(dst), 1)
    probe = FaultInjectingObjectClient(DirObjectClient(root), crash_exc=SimulatedCrash)
    ObjectStoreStorage(probe).recover_dir(dst)
    total = probe.op_count
    # state is now recovered; sweep on fresh copies of the crashed state
    for k in range(1, total + 1):
        for side in ("before", "after"):
            root_k = str(tmp_path / f"r{k}{side[0]}")
            dst_k = os.path.join(root_k, "data")
            setup_k = DirObjectClient(root_k)
            _write_copy(setup_k, ObjectStoreStorage(setup_k).stage_path(dst_k), 1)
            faulty = FaultInjectingObjectClient(
                DirObjectClient(root_k),
                fail_at_op=k,
                fail_side=side,
                crash_exc=SimulatedCrash,
            )
            try:
                ObjectStoreStorage(faulty).recover_dir(dst_k)
            except SimulatedCrash:
                pass
            ost = ObjectStoreStorage(DirObjectClient(root_k))
            ost.recover_dir(dst_k)
            assert _live_generation(ost, dst_k) == "g1"


# -- transient errors + bounded retry --------------------------------------


def test_transient_faults_survived_by_retry_layer(tmp_path):
    """20%% of round trips fail with a 503 (half of them AFTER the op
    landed server-side); the bounded-retry client must carry a 10-
    generation publish history through untouched. Exercises put/get/
    list/delete retries including re-flipping an already-landed pointer
    put and re-deleting an already-deleted GC key (the idempotence
    claims on RetryingObjectClient)."""
    root = str(tmp_path / "bucket")
    dst = os.path.join(root, "data")
    faulty = FaultInjectingObjectClient(
        DirObjectClient(root),
        rng=random.Random(1234),
        transient_rate=0.2,
        crash_exc=SimulatedCrash,
    )
    client = RetryingObjectClient(faulty, attempts=8)
    ost = ObjectStoreStorage(client)
    for g in range(1, 11):
        _write_copy(client, ost.stage_path(dst), g)
        ost.publish_dir(dst)
        assert _live_generation(ost, dst) == f"g{g}"
        ost.recover_dir(dst)  # reader-side repair mixed in
    assert _live_generation(ost, dst) == "g10"
    # only the live version remains (GC swept through the faults)
    vers = ost._versions(dst)
    assert len(vers) == 1
    assert faulty.transients_injected > 20  # the storm actually happened
    assert client.retries_used >= faulty.transients_injected


def test_retry_gives_up_after_bounded_attempts():
    class AlwaysDown(DirObjectClient):
        def get(self, key):
            raise ObjectStoreTransientError("503", op_done=False)

    client = RetryingObjectClient(
        FaultInjectingObjectClient(AlwaysDown("/tmp/_nonexistent_bucket_x")),
        attempts=3,
    )
    with pytest.raises(ObjectStoreTransientError):
        client.get("/tmp/_nonexistent_bucket_x/k")


# -- paged listings ---------------------------------------------------------


def test_paged_list_reassembles_and_protocol_survives_paging(tmp_path):
    """page_size=2 forces every LIST into multiple round trips with
    continuation tokens; listings must reassemble exactly and the whole
    publish/recover protocol must behave identically."""
    root = str(tmp_path / "bucket")
    dst = os.path.join(root, "data")
    client = FaultInjectingObjectClient(
        DirObjectClient(root), page_size=2, crash_exc=SimulatedCrash
    )
    ost = ObjectStoreStorage(client)
    staging = ost.stage_path(dst)
    for i in range(7):  # 7 keys -> 4 pages
        client.put(os.path.join(staging, f"part{i}.parquet"), f"g1:{i}".encode())
    ost.publish_dir(dst)
    keys = ost.client.list(ost.resolve(dst).rstrip("/") + "/")
    assert len(keys) == 7 and keys == sorted(keys)
    assert sorted(set(keys)) == keys  # no duplicates across pages
    # a second generation publishes and GCs correctly through paging
    s2 = ost.stage_path(dst)
    _write_copy(client, s2, 2)
    ost.publish_dir(dst)
    assert _live_generation(ost, dst) == "g2"
    assert not client.list(staging + "/")


def test_paged_list_is_not_a_snapshot(tmp_path):
    """Keys deleted between pages vanish from the listing; keys created
    behind the cursor are missed — the consistency contract callers get
    from S3 ListObjectsV2, reproduced so protocol code can't silently
    rely on snapshot listings."""
    root = str(tmp_path / "bucket")
    inner = DirObjectClient(root)
    for i in range(6):
        inner.put(os.path.join(root, "d", f"k{i}"), b"x")
    client = FaultInjectingObjectClient(inner, page_size=2, crash_exc=SimulatedCrash)

    mutated = []
    orig_rt = client._round_trip

    def mutate_after_first_page(op, *args):
        page = orig_rt(op, *args)
        if not mutated:
            mutated.append(True)
            inner.delete(os.path.join(root, "d", "k4"))  # ahead of cursor
            inner.put(os.path.join(root, "d", "k0a"), b"new")  # behind cursor
        return page

    client._round_trip = mutate_after_first_page
    got = [os.path.basename(k) for k in client.list(os.path.join(root, "d") + "/")]
    assert "k4" not in got  # deleted ahead of the cursor: gone
    assert "k0a" not in got  # created behind the cursor: missed
    assert got == ["k0", "k1", "k2", "k3", "k5"]


# -- GC grace window + concurrent readers -----------------------------------


def test_gc_grace_keeps_previous_live_copy_one_cycle(tmp_path):
    """Deterministic window semantics: with gc_grace_versions=1 a reader
    holding the pre-flip target can finish its read after ONE flip; the
    next flip retires that copy. grace=0 keeps today's immediate GC."""
    root = str(tmp_path / "bucket")
    dst = os.path.join(root, "data")
    client = DirObjectClient(root)
    ost = ObjectStoreStorage(client, gc_grace_versions=1)
    _write_copy(client, ost.stage_path(dst), 1)
    ost.publish_dir(dst)
    held = ost.resolve(dst)  # reader resolves, then a flip happens
    _write_copy(client, ost.stage_path(dst), 2)
    ost.publish_dir(dst)
    # the superseded copy is still fully readable (the grace window)
    assert {client.get(k).decode().split(":")[0] for k in client.list(held + "/")} == {"g1"}
    # recovery honors the window too
    ost.recover_dir(dst)
    assert {client.get(k).decode().split(":")[0] for k in client.list(held + "/")} == {"g1"}
    assert _live_generation(ost, dst) == "g2"
    # one more flip pushes gen 1 out of the window
    _write_copy(client, ost.stage_path(dst), 3)
    ost.publish_dir(dst)
    assert not client.list(held + "/")
    assert _live_generation(ost, dst) == "g3"


def test_gc_grace_never_preserves_abandoned_staging_scratch(tmp_path):
    """The window protects previously-LIVE copies only: a crashed staging
    between the outgoing and incoming live versions is always GC'd, and
    the previous live copy is what survives."""
    root = str(tmp_path / "bucket")
    dst = os.path.join(root, "data")
    client = DirObjectClient(root)
    ost = ObjectStoreStorage(client, gc_grace_versions=1)
    _write_copy(client, ost.stage_path(dst), 1)
    ost.publish_dir(dst)
    live1 = ost.resolve(dst)
    abandoned = ost.stage_path(dst)  # staged, never published
    _write_copy(client, abandoned, 99)
    s3 = ost.stage_path(dst)
    _write_copy(client, s3, 2)
    ost.publish_dir(dst)
    assert not client.list(abandoned + "/")  # scratch GC'd
    assert client.list(live1 + "/")  # previous live kept
    assert _live_generation(ost, dst) == "g2"


def test_concurrent_readers_never_see_torn_copy_during_flips(tmp_path):
    """Two reader threads resolve+read in a loop while the writer runs 12
    pointer flips with grace=1. Invariants: no read ever observes a
    mixed-generation copy; a read hitting a GC'd copy (possible once it
    outlives the window) repairs itself by re-resolving; every reader
    completes many successful reads."""
    root = str(tmp_path / "bucket")
    dst = os.path.join(root, "data")
    client = DirObjectClient(root)
    ost = ObjectStoreStorage(client, gc_grace_versions=1)
    _write_copy(client, ost.stage_path(dst), 0)
    ost.publish_dir(dst)

    stop = threading.Event()
    failures, reads = [], [0, 0]

    def reader(slot):
        while not stop.is_set():
            for _attempt in range(3):  # read-repair: re-resolve and retry
                live = ost.resolve(dst)
                try:
                    keys = sorted(client.list(live.rstrip("/") + "/"))
                    if len(keys) != N_PARTS:
                        continue  # mid-GC listing of a retiring copy
                    gens = {client.get(k).decode().split(":")[0] for k in keys}
                except KeyError:
                    continue  # copy retired mid-read: re-resolve
                if len(gens) != 1:
                    failures.append(f"torn read: {gens}")
                reads[slot] += 1
                break
            else:
                failures.append("read-repair exhausted 3 re-resolves")

    threads = [threading.Thread(target=reader, args=(s,)) for s in (0, 1)]
    for t in threads:
        t.start()
    try:
        for g in range(1, 13):
            _write_copy(client, ost.stage_path(dst), g)
            ost.publish_dir(dst)
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert failures == []
    assert min(reads) > 10  # readers actually raced the flips
    assert _live_generation(ost, dst) == "g12"


# -- the engine's six lifecycle shapes through an unreliable store ----------


@pytest.fixture()
def flaky_engine(spark, tmp_path):
    """An engine whose every storage-protocol round trip goes through a
    15% transient-fault injector behind the bounded-retry client —
    Spark's own parquet IO still hits the bucket directory directly,
    exactly as s3a:// executors would while the driver runs the
    pointer protocol over the SDK."""
    from sneldb_spark.engine import SnelDB

    root = str(tmp_path / "db")
    faulty = FaultInjectingObjectClient(
        DirObjectClient(root),
        rng=random.Random(97),
        transient_rate=0.15,
        crash_exc=SimulatedCrash,
    )
    db = SnelDB(
        spark, root, storage=ObjectStoreStorage(RetryingObjectClient(faulty, attempts=8))
    )
    db._flaky = faulty
    return db


def test_engine_lifecycle_on_faulty_object_store(flaky_engine):
    db = flaky_engine
    db.execute('DEFINE fo FIELDS { "k": "string", "n": "int" }')
    for i in range(40):
        db.execute(f'STORE fo FOR c{i % 5} PAYLOAD {{ "k": "k{i % 3}", "n": {i} }}')
    db.execute("FLUSH")
    db.execute("REMEMBER QUERY fo COUNT BY k AS mat")
    rows = {r["k"]: r["count"] for r in db.execute("SHOW mat").df.collect()}
    assert rows == {"k0": 14, "k1": 13, "k2": 13}
    for i in range(40, 60):
        db.execute(f'STORE fo FOR c{i % 5} PAYLOAD {{ "k": "k{i % 3}", "n": {i} }}')
    db.execute("FLUSH")
    db.store.compact("fo")
    rows = {r["k"]: r["count"] for r in db.execute("SHOW mat").df.collect()}
    assert rows == {"k0": 20, "k1": 20, "k2": 20}
    assert db.query("QUERY fo WHERE n >= 50").count() == 10
    assert db._flaky.transients_injected > 0  # the store really was flaky
    db.execute("FORGET mat")


def test_soak_fault_lane_wiring(spark, tmp_path):
    """The ops soak's --fault-rate lane: a short service run on the
    fault-injecting object backend must stay green end-to-end and report
    the injected/absorbed counts in its summary (the 15-min evidence run
    is soak_object_faults_r8.json; this pins the wiring)."""
    from sneldb_spark.tools.soak import run_soak

    summary = run_soak(
        duration=6.0,
        backend="object",
        writers=2,
        batch_size=20,
        flush_every=2.0,
        show_every=4.0,
        sample_every=2.0,
        root=str(tmp_path / "soakroot"),
        master="local[4]",
        fault_rate=0.3,
        fault_latency_ms=0.2,
    )
    assert summary["ok"], summary["checks"]
    f = summary["faults"]
    assert f["transients_injected"] > 0  # the store really was flaky
    assert f["retries_used"] > 0  # ...and the retry layer did the absorbing
    assert summary["checks"]["I1_counts_exact"]["ok"]
