"""Long-running service soak: the engine as a SERVICE, not an episode.

Every test in the suite is a short episode; this tool runs the engine
for `--duration` seconds as a live TCP service under a realistic
concurrent mix and asserts the operational invariants a deployment
cares about:

  - N writer connections streaming BATCHed STOREs continuously
  - a FLUSH cadence (memtable -> segment) with flush-auto compaction
    plus the engine's periodic compaction
  - two live materializations (COUNT BY and a two-step sequence)
    refreshed on a SHOW cadence
  - a read mix (filtered QUERY / REPLAY / scalar aggregate) sampling
    latency the whole time

End-of-run invariants (process exits 1 if any fails):

  I1  exactness: per-type engine row counts == acked events; the
      COUNT BY materialization equals the writers' own per-plan tally
  I2  segment-file convergence: per-type parquet file count stays
      bounded by compaction (< files_cap), never monotone growth
  I3  memtable drains: pending buffer is empty after the final FLUSH
  I4  WAL bounded: live WAL bytes ~0 after final FLUSH (rotated +
      deleted); archive grows only with ingested volume (conservative
      archiving keeps everything by design — reported, not asserted)
  I5  latency stability: the BOUNDED read's p95 (LIMIT early-exit — the
      access-path probe) stays within 2x of the first third; full scans
      and full materialization drains are reported as
      seconds-per-million-rows so data growth shows up as throughput,
      not "drift"
  I6  SHOW time-to-first-frame p95 < 10 s under FULL SATURATION (20 s
      with injected storage faults). Serve-then-refresh puts first
      frames on the wire at storage-read latency — ~0.3-0.5 s measured
      quiet (BASELINE.md round 9) — and the saturated bound covers the
      residual GIL convoy + bulk-task-slot waits of a single-
      interpreter soak box; r8's refresh-then-serve measured 148-365 s
      on the same probe. The probe is a bounded `SHOW <name> LIMIT k`
      (the monitoring read pattern); FULL drains of the growing result
      go over the Arrow IPC server — columnar encode, not per-cell
      JSON, which is what convoyed the r9 90-min run
  I7  a SEPARATE-PROCESS reader (own interpreter + client socket) sees
      zero failed reads — the grace window holds across processes

Usage:
  sneldb-soak --duration 1800    (console script; python -m sneldb_spark.tools.soak also works)
  python tools/soak.py --duration 120 --backend grace --out soak.json
  python tools/soak.py --duration 1800 --backend object --writers 4

Backends: "grace" (served default — pointer-flip publish, reader grace
window), "object" (same protocol on the object-store fake), "local"
(rename-based POSIX swaps — known to lose segment files under a reader
racing a compaction publish; soak-able to demonstrate exactly that,
see soak_local_r8.json).

The reference has no soak binary; this is the operational-evidence
counterpart of its long-running server deployment story
(docs/src/design/wal_archiving.md, compaction.md).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import threading
import time

_PLANS = [f"plan{i:02d}" for i in range(8)]


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _d, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _parquet_files(path: str) -> int:
    n = 0
    for _dp, _d, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _pctl(xs: list[float], q: float) -> float:
    if not xs:
        return 0.0
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


def _version_dirs(path: str) -> int:
    """Count grace/object versioned-prefix dirs (`*.vN`) under `path`."""
    import re as _re

    n = 0
    pat = _re.compile(r"\.v\d+$")
    for _dp, dirnames, _f in os.walk(path):
        n += sum(1 for d in dirnames if pat.search(d))
    return n


def _proc_reader_main(url: str, duration: float, out: str) -> int:
    """Separate-PROCESS reader (spawned by run_soak): a client loop in
    its own interpreter proves the grace window holds across processes,
    not just threads — a reader that shares no locks, no memtable
    references, and no Spark session with the server. It also carries
    the SHOW time-to-first-frame probe: an in-process client thread
    measures its own GIL-starvation on top of server latency (writers
    and the probe share one interpreter), so the wire-truthful TTFF a
    real client sees must be taken from outside the process."""
    from sneldb_spark.client import SnelDBClient

    rng = random.Random(43)
    queries = [
        'QUERY soak_evt WHERE plan = "plan05" LIMIT 50',
        "QUERY soak_click COUNT",
        "REPLAY FOR w1c17",
        "QUERY soak_evt TOTAL n",
    ]
    lat: list[float] = []
    ttff: list[float] = []
    errs: list[str] = []
    t_end = time.monotonic() + duration
    try:
        with SnelDBClient(url, timeout=600.0) as c:
            n = 0
            while time.monotonic() < t_end:
                q = queries[rng.randrange(len(queries))]
                t0 = time.monotonic()
                r = c.try_execute(q)
                lat.append(time.monotonic() - t0)
                if not r.ok:
                    errs.append(f"{q} -> {r.message}")
                    break
                n += 1
                if n % 5 == 0:
                    # SHOW TTFF probe on the event-shaped materialization
                    # (exists once the shower created it; skip before).
                    # Bounded (`LIMIT 100`): the probe measures first
                    # frames, not a full drain of a growing result.
                    t0 = time.monotonic()
                    first = None
                    for frame in c.execute_stream("SHOW soak_seq LIMIT 100"):
                        if first is None and frame.get("type") in (
                            "batch", "end",
                        ):
                            first = time.monotonic() - t0
                        if frame.get("type") == "error":
                            first = None  # not created yet — ignore
                            break
                    if first is not None:
                        ttff.append(first)
                time.sleep(2.0)
    except Exception as e:  # noqa: BLE001 — report, don't crash silently
        errs.append(repr(e))
    with open(out, "w", encoding="utf-8") as f:
        json.dump(
            {
                "reads": len(lat),
                "errors": errs[:10],
                "read_p95_s": round(_pctl(lat, 0.95), 3),
                "show_ttff_p95_s": round(_pctl(ttff, 0.95), 3),
                "show_ttff_reads": len(ttff),
            },
            f,
        )
    return 1 if errs else 0


def _proc_bulk_main(arrow_url: str, duration: float, out: str) -> int:
    """Separate-PROCESS bulk exporter (VERDICT r10 #3): full Arrow-IPC
    drains of the growing soak_seq result from an interpreter that
    shares nothing with the server but the TCP socket — the honest
    model of a real bulk consumer, and it stops a 10M-row export's
    decode work from GIL-convoying the writers' interpreter (the r10
    ladder's TimeoutError + I5 near-miss). Results land in `out` after
    every drain (atomic replace), so a late kill still reports."""
    from sneldb_spark.client import SnelDBClient

    drains: list[tuple[float, int]] = []
    errs: list[str] = []
    t_end = time.monotonic() + duration

    def dump():
        tmp = out + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump({"drains": drains, "errors": errs[:10]}, f)
        os.replace(tmp, out)

    t_start = time.monotonic()
    time.sleep(min(30.0, duration / 3))  # let soak_seq exist
    while time.monotonic() < t_end:
        t0 = time.monotonic()
        try:
            # a FRESH connection per drain: a socket that tripped its
            # idle cap is dead — reusing it turns one slow drain into a
            # cascade of instant "cannot read from timed out object"
            # failures (r11 ladder). The generous per-read cap covers
            # legitimate inter-frame gaps behind a flush convoy.
            with SnelDBClient(arrow_url, timeout=1800.0,
                              output_format="arrow") as ac:
                table = ac.execute_table("SHOW soak_seq")
            if table is not None and table.num_rows:
                drains.append(
                    (round(time.monotonic() - t0, 3), int(table.num_rows))
                )
                dump()
        except Exception as e:  # noqa: BLE001
            errs.append(
                f"t={round(time.monotonic() - t_start, 1)}s "
                f"after={round(time.monotonic() - t0, 1)}s: {e!r}"
            )
            dump()
        # bulk-export cadence ~2 min; no sane consumer re-exports a
        # growing 10M-row result more often
        wake = time.monotonic() + 120.0
        while time.monotonic() < min(wake, t_end):
            time.sleep(1.0)
    dump()
    return 1 if errs else 0


def run_soak(
    *,
    duration: float = 120.0,
    backend: str = "local",
    writers: int = 4,
    batch_size: int = 50,
    flush_every: float = 5.0,
    show_every: float = 20.0,
    sample_every: float = 10.0,
    root: str | None = None,
    master: str = "local[8]",
    fault_rate: float = 0.0,
    fault_latency_ms: float = 0.0,
) -> dict:
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.client import SnelDBClient
    from sneldb_spark.server import SnelDBServer
    from sneldb_spark.session import get_spark, quiet_logs

    import tempfile

    root = root or tempfile.mkdtemp(prefix=f"soak_{backend}_")
    # GIL convoy mitigation: the soak intentionally runs writers, server
    # handler threads, AND the measuring clients in ONE interpreter; at
    # full ingest the CPU-bound parse/validate threads monopolize the
    # GIL in 5 ms slices and IO-bound threads (the SHOW streamer, the
    # latency probes) wait out multi-second convoys — measured as ~18 s
    # of pure thread-scheduling delay on a SHOW whose server-side work
    # was 4 s. 1 ms switching bounds each wait at queue_len x 1 ms.
    sys.setswitchinterval(0.001)
    # FAIR scheduling: a served engine runs bulk jobs (flush commits,
    # background materialization folds) concurrently with interactive
    # reads; under FIFO a small serve job queues behind whole bulk jobs
    # (head-of-line blocking measured at 70+ s SHOW time-to-first-frame
    # on a saturated box), under FAIR it gets task slots as they free.
    spark = get_spark(
        app_name="soak", master=master, shuffle_partitions=8,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    quiet_logs(spark)

    storage = None
    fault_client = None
    if backend == "object":
        from sneldb_spark.store.storage import (
            DirObjectClient,
            FaultInjectingObjectClient,
            ObjectStoreStorage,
            RetryingObjectClient,
        )

        client = DirObjectClient(root)
        if fault_rate or fault_latency_ms:
            # the fault lane: every put/get/delete/list-page round trip
            # draws an injected 503 (half with the op already landed) and
            # pays per-request latency; a bounded-retry client absorbs
            # them like a real SDK retry policy. attempts=8 keeps the
            # chance of a terminal failure ~rate^8 per op, so a clean
            # soak means the RETRIES did the work, not luck.
            fault_client = FaultInjectingObjectClient(
                client,
                rng=random.Random(7),
                transient_rate=fault_rate,
                latency_s=fault_latency_ms / 1000.0,
                page_size=500,
            )
            client = RetryingObjectClient(fault_client, attempts=8, backoff_s=0.01)
        storage = ObjectStoreStorage(client, gc_grace_versions=1)
    elif backend == "grace":
        # the served default ([storage] backend = "grace"): pointer-flip
        # publishes with a reader grace window. The rename-based "local"
        # backend is soak-able for comparison but KNOWN to lose files
        # under a reader that races a compaction publish (the soak run
        # that caught it: soak_local_r8.json, reader FAILED_READ_FILE)
        from sneldb_spark.store.storage import grace_local_storage

        storage = grace_local_storage(root)

    db = SnelDB(
        spark,
        root,
        wal_archive_dir=os.path.join(root, "archive"),
        auto_compact_files=8,
        compaction_interval=30,
        storage=storage,
        # memtable capacity (reference fill_factor * event_per_zone *
        # shards): above this the engine flushes ITSELF, so when the 5 s
        # FLUSH cadence falls behind the ingest rate the memtable stops
        # growing at ~capacity instead of ballooning (r10 ladder: 1.3M
        # pending rows, I6 FAIL). The hard admission bound is 4x; the
        # servers reject writes with retry-later at 90% of that.
        memtable_capacity=64_000,
    )
    server = SnelDBServer(db).start()
    host, port = server.address
    url = f"tcp://{host}:{port}"
    # second frontend on the SAME engine, Arrow IPC output: bulk drains
    # of large results go here (reference [server] output_format —
    # deployments expose both). Per-cell JSON encoding of a ~1M-row
    # materialization is CPU-bound Python and convoyed the r9 90-min
    # soak's single interpreter; Arrow batches encode columnar.
    arrow_server = SnelDBServer(db, output_format="arrow").start()
    ahost, aport = arrow_server.address
    arrow_url = f"tcp://{ahost}:{aport}"

    with SnelDBClient(url) as admin:
        admin.execute(
            'DEFINE soak_evt FIELDS { "n": "u64", "plan": %s, "user_id": "u64" }'
            % json.dumps(_PLANS)
        )
        admin.execute('DEFINE soak_click FIELDS { "n": "u64", "user_id": "u64" }')

    stop = threading.Event()
    errors: list[str] = []
    acked = {"soak_evt": 0, "soak_click": 0}
    plan_tally: dict[str, int] = {p: 0 for p in _PLANS}
    pressure_retries = [0]  # writer batches rejected with retry-later
    tally_lock = threading.Lock()

    def writer(w: int):
        rng = random.Random(1000 + w)
        try:
            with SnelDBClient(url, timeout=300.0) as c:
                seq = 0
                while not stop.is_set():
                    stores, plans = [], []
                    for _ in range(batch_size):
                        et = "soak_evt" if seq % 4 else "soak_click"
                        uid = rng.randint(0, 199)
                        if et == "soak_evt":
                            plan = _PLANS[seq % len(_PLANS)]
                            plans.append(plan)
                            stores.append(
                                f'STORE soak_evt FOR w{w}c{uid} PAYLOAD '
                                f'{{"n": {seq}, "plan": "{plan}", "user_id": {uid}}}'
                            )
                        else:
                            stores.append(
                                f'STORE soak_click FOR w{w}c{uid} PAYLOAD '
                                f'{{"n": {seq}, "user_id": {uid}}}'
                            )
                        seq += 1
                    batch = "BATCH [ " + "; ".join(stores) + " ]"
                    r = c.try_execute(batch)
                    # honest client behavior for the reference's
                    # backpressure contract: "Server is under pressure,
                    # please retry later" means back off and resend the
                    # SAME batch (nothing was ingested), not die
                    while not r.ok and "under pressure" in (r.message or ""):
                        with tally_lock:
                            pressure_retries[0] += 1
                        if stop.wait(0.1):
                            return
                        r = c.try_execute(batch)
                    if not r.ok:
                        errors.append(f"writer{w}: {r.message}")
                        return
                    with tally_lock:
                        acked["soak_evt"] += sum(1 for s in stores if "soak_evt" in s)
                        acked["soak_click"] += sum(
                            1 for s in stores if "soak_click" in s
                        )
                        for p in plans:
                            plan_tally[p] += 1
        except Exception as e:  # pragma: no cover
            errors.append(f"writer{w}: {e!r}")

    def flusher():
        try:
            with SnelDBClient(url, timeout=600.0) as c:
                while not stop.wait(flush_every):
                    c.execute("FLUSH")
        except Exception as e:  # pragma: no cover
            errors.append(f"flusher: {e!r}")

    # time-to-first-frame per SHOW, keyed by materialization: the
    # serve-then-refresh claim (first bytes at storage-read latency)
    # applies to the EVENT-SHAPED soak_seq; the aggregate soak_counts is
    # a state MERGE — deliberately refresh-then-serve — so its first
    # frame waits for the merge and is reported, not asserted
    show_ttff: dict[str, list[float]] = {"soak_counts": [], "soak_seq": []}

    def shower():
        # NOTE: the FULL Arrow drain (bulk-export pattern) moved to a
        # SEPARATE PROCESS (_proc_bulk_main, VERDICT r10 #3): a 12M-row
        # export sharing this interpreter with the writers was the r10
        # ladder's one TimeoutError and the I5 near-miss — and a real
        # bulk consumer is its own process anyway.
        try:
            with SnelDBClient(url, timeout=600.0) as c:
                # materializations appear once some data exists
                time.sleep(min(10.0, duration / 4))
                c.execute("REMEMBER QUERY soak_evt COUNT BY plan AS soak_counts")
                c.execute(
                    "REMEMBER QUERY soak_evt FOLLOWED BY soak_click AS soak_seq"
                )
                while not stop.wait(show_every):
                    for name in ("soak_counts", "soak_seq"):
                        # bounded probe (`SHOW <name> LIMIT k`): the
                        # monitoring read pattern — first frames without
                        # forcing a full drain of a growing result. The
                        # refresh/fold cadence rides on this SHOW.
                        t0 = time.monotonic()
                        first = None
                        for frame in c.execute_stream(f"SHOW {name} LIMIT 100"):
                            if first is None and frame.get("type") in (
                                "batch", "end", "error",
                            ):
                                first = time.monotonic() - t0
                            if frame.get("type") == "error":
                                errors.append(
                                    f"shower: SHOW {name} -> {frame.get('message')}"
                                )
                                return
                        show_ttff[name].append(
                            first if first is not None else 0.0
                        )
        except Exception as e:  # pragma: no cover
            errors.append(f"shower: {e!r}")

    # (t_since_start, query_idx, seconds, acked_events_at_read): per-query
    # tracking separates ACCESS-PATH stability (bounded reads must stay
    # flat) from data growth (full scans are linear in ingested volume BY
    # DESIGN — their drift is the data, not the storage path)
    read_lat: list[tuple[float, int, float, int]] = []
    t_start = time.monotonic()

    # index 0 is the BOUNDED read (LIMIT early-exits the scan) — the one
    # I5 holds to a 2x band; the others scale with corpus size
    _READ_QUERIES = [
        'QUERY soak_evt WHERE plan = "plan03" LIMIT 100',
        "REPLAY FOR w0c42",
        "QUERY soak_evt TOTAL n, COUNT",
        "QUERY soak_evt WHERE user_id >= 150 COUNT BY plan",
    ]

    def reader():
        rng = random.Random(7)
        try:
            with SnelDBClient(url, timeout=600.0) as c:
                while not stop.wait(3.0):
                    qi = rng.randrange(len(_READ_QUERIES))
                    n_now = sum(acked.values())
                    t0 = time.monotonic()
                    r = c.try_execute(_READ_QUERIES[qi])
                    dt = time.monotonic() - t0
                    if not r.ok:
                        errors.append(
                            f"reader: {_READ_QUERIES[qi]} -> {r.message}"
                        )
                        return
                    read_lat.append(
                        (time.monotonic() - t_start, qi, dt, n_now)
                    )
        except Exception as e:  # pragma: no cover
            errors.append(f"reader: {e!r}")

    samples: list[dict] = []

    def sampler():
        ev_dir = os.path.join(root, "events")
        while not stop.wait(sample_every):
            with db.store._pending_lock:
                pending = sum(len(v) for v in db.store._pending.values())
            recent = [d for (_t, _q, d, _n) in read_lat[-50:]]
            # serve-frame memory audit (VERDICT r10 #6): live registered
            # serve frames and the pinned superseded copies they hold,
            # plus total cached RDD bytes (localCheckpointed delta
            # bundles live there) — a long-running service must show
            # these bounded, not climbing with publish count
            with db.materializer._fold_lock:
                serve_frames = {
                    n: len(ws)
                    for n, ws in db.materializer._serve_frames.items()
                    if len(ws)
                }
            pinned_copies = sum(
                len(db.materializer._pinned_lives(n)) for n in serve_frames
            )
            try:
                cached_rdd_mb = round(
                    sum(
                        i.memSize() + i.diskSize()
                        for i in spark.sparkContext._jsc.sc()
                        .getRDDStorageInfo()
                    )
                    / 1e6,
                    1,
                )
            except Exception:  # pragma: no cover — JVM API drift guard
                cached_rdd_mb = -1.0
            samples.append(
                {
                    "t": round(time.monotonic() - t_start, 1),
                    "serve_frames": serve_frames,
                    "pinned_copies": pinned_copies,
                    "cached_rdd_mb": cached_rdd_mb,
                    "acked": dict(acked),
                    "segment_parquet_files": _parquet_files(ev_dir),
                    "total_parquet_files": _parquet_files(root),
                    # versioned-prefix accumulation (grace/object publish
                    # protocol): the suspect behind the r8 object-backend
                    # read-p95 growth — sampled to profile it
                    "version_dirs": _version_dirs(root),
                    "wal_bytes": _dir_bytes(os.path.join(root, "wal")),
                    "archive_bytes": _dir_bytes(os.path.join(root, "archive")),
                    "pending_rows": pending,
                    "read_p50_s": round(_pctl(recent, 0.5), 3),
                    "read_p95_s": round(_pctl(recent, 0.95), 3),
                }
            )

    # separate-PROCESS reader: its own interpreter + client connection,
    # sharing nothing with the server process but the TCP socket and the
    # on-disk grace protocol
    import subprocess

    proc_out = os.path.join(root, "proc_reader.json")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "sneldb_spark.tools.soak",
            "--proc-reader", url,
            "--proc-duration", str(duration),
            "--proc-out", proc_out,
        ],
        env={**os.environ, "PYTHONPATH": os.pathsep.join(sys.path)},
    )
    # separate-PROCESS bulk exporter (own interpreter + Arrow socket)
    bulk_out = os.path.join(root, "proc_bulk.json")
    bulk_proc = subprocess.Popen(
        [
            sys.executable, "-m", "sneldb_spark.tools.soak",
            "--proc-bulk", arrow_url,
            "--proc-duration", str(duration),
            "--proc-out", bulk_out,
        ],
        env={**os.environ, "PYTHONPATH": os.pathsep.join(sys.path)},
    )

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(writers)]
    threads += [
        threading.Thread(target=flusher),
        threading.Thread(target=shower),
        threading.Thread(target=reader),
        threading.Thread(target=sampler),
    ]
    for t in threads:
        t.start()
    try:
        time.sleep(duration)
    finally:
        stop.set()
        for t in threads:
            t.join()
    try:
        proc_rc = proc.wait(timeout=300)
    except subprocess.TimeoutExpired:  # pragma: no cover
        proc.kill()
        proc_rc = -9
    try:
        # a bulk drain started just before the deadline can legitimately
        # run long — it is live Arrow streaming, not a stall
        bulk_rc = bulk_proc.wait(timeout=1800)
    except subprocess.TimeoutExpired:  # pragma: no cover
        bulk_proc.kill()
        bulk_rc = -9
    bulk_summary: dict = {}
    if os.path.exists(bulk_out):
        with open(bulk_out, encoding="utf-8") as f:
            bulk_summary = json.load(f)
    drain_lat = [tuple(d) for d in bulk_summary.get("drains", [])]

    # final settle: flush, settle the background compactor, then the
    # explicit converging compacts, then measure
    db.store.flush()
    compact_errs = db.store.quiesce_compaction()
    if compact_errs:  # pragma: no cover
        errors.extend(f"compactor: {e!r}" for _t, e in compact_errs)
    for et in ("soak_evt", "soak_click"):
        db.store.compact(et)
    final_files = _parquet_files(os.path.join(root, "events"))
    with db.store._pending_lock:
        final_pending = sum(len(v) for v in db.store._pending.values())
    final_wal = _dir_bytes(os.path.join(root, "wal"))
    final_archive = _dir_bytes(os.path.join(root, "archive"))
    data_bytes = _dir_bytes(os.path.join(root, "events"))

    # I1 exactness
    checks: dict[str, dict] = {}
    n_evt = db.df("soak_evt").count()
    n_click = db.df("soak_click").count()
    checks["I1_counts_exact"] = {
        "ok": n_evt == acked["soak_evt"] and n_click == acked["soak_click"],
        "engine": {"soak_evt": n_evt, "soak_click": n_click},
        "acked": dict(acked),
    }
    shown = {
        r["plan"]: r["count"]
        for r in db.execute("SHOW soak_counts").df.collect()
    }
    expected_plans = {p: c for p, c in plan_tally.items() if c}
    checks["I1_materialization_exact"] = {
        "ok": shown == expected_plans,
        "shown_groups": len(shown),
    }
    # I2 segment convergence: compaction keeps per-type file counts near
    # auto_compact_files; 2 types * cap * headroom for the window between
    # compactions, plus the time-series must not be monotone increasing
    files_series = [s["segment_parquet_files"] for s in samples]
    files_cap = 2 * 8 * 6
    checks["I2_segments_converge"] = {
        "ok": final_files <= files_cap
        and (len(files_series) < 4 or min(files_series[2:]) < max(files_series) ),
        "final_files": final_files,
        "cap": files_cap,
        "series": files_series,
    }
    checks["I3_memtable_drained"] = {"ok": final_pending == 0, "pending": final_pending}
    checks["I4_wal_bounded"] = {
        "ok": final_wal < 64 * 1024,
        "final_wal_bytes": final_wal,
        "archive_bytes": final_archive,
        "data_bytes": data_bytes,
        "archive_to_data_ratio": round(final_archive / max(1, data_bytes), 3),
    }
    # r9 (VERDICT r8 #3): the old I5 mixed full scans into one p95, so
    # drift from DATA GROWTH (a TOTAL/COUNT over a corpus that doubled
    # mid-run costs 2x — correct, linear behavior) read as instability
    # and had to hide behind a generous 4x bound. Split: the BOUNDED
    # query (LIMIT early-exit) holds a tightened 2x band — that is the
    # access-path invariant (file listings, footer sweeps, versioned-
    # prefix resolution must not degrade) — while the full scans report
    # seconds-per-million-events so growth is visible AS throughput.
    bounded = [(t, d) for (t, q, d, _n) in read_lat if q == 0]
    third = max(1, len(bounded) // 3)
    first_p95 = _pctl([d for _t, d in bounded[:third]], 0.95)
    last_p95 = _pctl([d for _t, d in bounded[-third:]], 0.95)
    scans = [(d, n) for (_t, q, d, n) in read_lat if q in (2, 3) and n > 0]
    half = len(scans) // 2
    spm_first = _pctl([d / n * 1e6 for d, n in scans[:half]], 0.95)
    spm_last = _pctl([d / n * 1e6 for d, n in scans[half:]], 0.95)
    checks["I5_latency_stable"] = {
        "ok": (not bounded) or last_p95 <= max(2 * first_p95, first_p95 + 1.0),
        "bounded_first_third_p95_s": round(first_p95, 3),
        "bounded_last_third_p95_s": round(last_p95, 3),
        "bounded_reads": len(bounded),
        "scan_sec_per_1m_events_first_p95": round(spm_first, 3),
        "scan_sec_per_1m_events_last_p95": round(spm_last, 3),
        "scan_reads": len(scans),
        "reads": len(read_lat),
        # full Arrow drains of the growing soak_seq result: wall p95 plus
        # the growth-normalized per-row cost (sec per 1M rows) — the
        # per-row figure is the one that must stay flat as the result
        # grows; wall time grows with rows BY DESIGN
        "arrow_drain_p95_s": round(
            _pctl([d for d, _n in drain_lat], 0.95), 3
        ),
        "arrow_drain_sec_per_1m_rows_p95": round(
            _pctl([d / n * 1e6 for d, n in drain_lat if n > 0], 0.95), 3
        ),
        "arrow_drains": len(drain_lat),
        "arrow_drain_max_rows": max((n for _d, n in drain_lat), default=0),
    }
    # I6: SHOW time-to-first-frame on the EVENT-SHAPED materialization —
    # serve-then-refresh must put first bytes on the wire at
    # storage-read latency even under full ingest (reference
    # StoredFrameStreamer parity). The aggregate SHOW's TTFF is reported
    # alongside (state merge = refresh-then-serve by design). Fault
    # lanes pay injected per-round-trip latency on the storage protocol
    # ops, so the bound scales there.
    proc_summary = {}
    if os.path.exists(proc_out):
        with open(proc_out, encoding="utf-8") as f:
            proc_summary = json.load(f)
    # 10 s at FULL SATURATION (every core busy with ingest/flush/fold
    # work, one shared Python interpreter): the decomposed floor is GIL
    # convoy on the driver-side serve work plus waiting out in-flight
    # bulk task slots (FAIR pools interleave queued tasks but preempt
    # nothing). The quiet-path first frame is a storage read (~0.3-0.5 s
    # measured; BASELINE.md round 9) — the architecture claim — while
    # this bound asserts the saturated service stays interactive, vs
    # the 148-365 s refresh-then-serve p95 the r8 soaks measured.
    ttff_limit = 10.0 if not (fault_rate or fault_latency_ms) else 20.0
    seq_ttff = show_ttff["soak_seq"]
    # the ASSERTED TTFF comes from the separate-process client — the
    # in-process probe shares the interpreter with the CPU-bound writer
    # threads and measures its own GIL starvation on top of the server
    # (sys.setswitchinterval above bounds but does not remove that);
    # both numbers are reported
    proc_ttff = proc_summary.get("show_ttff_p95_s", 0.0)
    proc_ttff_n = proc_summary.get("show_ttff_reads", 0)
    asserted = proc_ttff if proc_ttff_n else _pctl(seq_ttff, 0.95)
    checks["I6_show_ttff"] = {
        "ok": (proc_ttff_n == 0 and not seq_ttff) or asserted < ttff_limit,
        "client_proc_ttff_p95_s": proc_ttff,
        "client_proc_shows": proc_ttff_n,
        "inproc_seq_ttff_p95_s": round(_pctl(seq_ttff, 0.95), 3),
        "inproc_agg_ttff_p95_s": round(
            _pctl(show_ttff["soak_counts"], 0.95), 3
        ),
        "limit_s": ttff_limit,
    }
    # I7: the separate-process reader saw zero failed reads
    checks["I7_multiprocess_reader"] = {
        "ok": proc_rc == 0
        and not proc_summary.get("errors")
        and proc_summary.get("reads", 0) > 0,
        "exit_code": proc_rc,
        **proc_summary,
    }
    # I8: the bulk exporter's drained row counts must be NON-DECREASING —
    # soak_seq is append-only (FOLLOWED BY pairs only accrue), so a drop
    # means stored history was lost. This is the invariant that caught
    # the r11 recover-vs-compaction-staging data loss (a SHOW's recover
    # GC'd the auto-compact's half-written staging and a truncated base
    # was published: drains went 11.6M -> 1.4M mid-run).
    drain_rows = [n for _d, n in drain_lat]
    checks["I8_bulk_drains_monotone"] = {
        "ok": all(a <= b for a, b in zip(drain_rows, drain_rows[1:])),
        "rows_series": drain_rows,
        "bulk_exit_code": bulk_rc,
        "bulk_errors": bulk_summary.get("errors", []),
    }
    checks["no_thread_errors"] = {"ok": not errors, "errors": errors[:10]}

    server.stop()
    arrow_server.stop()
    # disk-growth slopes over the sampled series: the WAL archive grows
    # with ingested volume BY DESIGN (conservative archiving keeps
    # everything) — reported so a capacity plan can read the rate; the
    # data dir must converge (I2 asserts the file count; the byte slope
    # here shows compaction holding the line)
    slopes = {}
    if len(samples) >= 2:
        dt_min = max(1e-9, (samples[-1]["t"] - samples[0]["t"]) / 60.0)
        slopes = {
            "archive_mb_per_min": round(
                (samples[-1]["archive_bytes"] - samples[0]["archive_bytes"])
                / dt_min / 1e6, 3,
            ),
            "wal_live_final_mb": round(samples[-1]["wal_bytes"] / 1e6, 3),
            "version_dirs_first": samples[0]["version_dirs"],
            "version_dirs_last": samples[-1]["version_dirs"],
        }
    summary = {
        "backend": backend,
        "duration_s": duration,
        "writers": writers,
        "batch_size": batch_size,
        "acked_events": dict(acked),
        "throughput_ev_s": round(sum(acked.values()) / duration, 1),
        # batches the frontends rejected with the reference's
        # retry-later error (writers resent them; acked counts only
        # successful batches, so exactness is unaffected)
        "pressure_retries": pressure_retries[0],
        # serve-frame memory audit (VERDICT r10 #6): both must read as
        # BOUNDED over the run. Eviction story: pinned copies drop when
        # their reader frames are GC'd; checkpointed delta-bundle blocks
        # are freed by Spark's ContextCleaner once the frames holding
        # them die (explicit unpersist would be WRONG — localCheckpoint
        # truncates lineage, so a live slow reader's frame would become
        # unrecomputable). Bounded-by-GC, verified by this metric.
        "serve_frame_audit": {
            "max_pinned_copies": max(
                (s["pinned_copies"] for s in samples), default=0
            ),
            "final_pinned_copies": (
                samples[-1]["pinned_copies"] if samples else 0
            ),
            "max_cached_rdd_mb": max(
                (s["cached_rdd_mb"] for s in samples), default=0.0
            ),
            "final_cached_rdd_mb": (
                samples[-1]["cached_rdd_mb"] if samples else 0.0
            ),
        },
        "bulk_export": {
            "exit_code": bulk_rc,
            "drains": len(drain_lat),
            "errors": bulk_summary.get("errors", []),
        },
        "disk_slopes": slopes,
        "samples": samples,
        "checks": checks,
        "ok": all(c["ok"] for c in checks.values()),
        "root": root,
    }
    if fault_client is not None:
        summary["faults"] = {
            "transient_rate": fault_rate,
            "latency_ms": fault_latency_ms,
            "object_ops": fault_client.op_count,
            "transients_injected": fault_client.transients_injected,
            "retries_used": storage.client.retries_used,
        }
    return summary


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    # hidden lane: run as the separate-process reader run_soak spawns
    ap.add_argument("--proc-reader", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--proc-bulk", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--proc-duration", type=float, default=120.0,
                    help=argparse.SUPPRESS)
    ap.add_argument("--proc-out", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--duration", type=float, default=120.0)
    ap.add_argument("--backend", choices=("grace", "local", "object"), default="grace")
    ap.add_argument("--writers", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=50)
    ap.add_argument("--out", default=None, help="write full JSON summary here")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--fault-rate", type=float, default=0.0,
                    help="object backend only: injected transient-error "
                         "rate per object-store round trip")
    ap.add_argument("--fault-latency-ms", type=float, default=0.0,
                    help="object backend only: per-round-trip latency")
    args = ap.parse_args()
    if args.proc_reader:
        sys.exit(
            _proc_reader_main(args.proc_reader, args.proc_duration, args.proc_out)
        )
    if args.proc_bulk:
        sys.exit(
            _proc_bulk_main(args.proc_bulk, args.proc_duration, args.proc_out)
        )
    summary = run_soak(
        duration=args.duration,
        backend=args.backend,
        writers=args.writers,
        batch_size=args.batch_size,
        master=args.master,
        fault_rate=args.fault_rate,
        fault_latency_ms=args.fault_latency_ms,
    )
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(summary, f, indent=1)
    slim = {k: v for k, v in summary.items() if k != "samples"}
    print(json.dumps(slim, indent=1))
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
