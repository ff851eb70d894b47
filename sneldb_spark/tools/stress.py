"""Frontend load generator — the counterpart of the reference's
`stress_tcp` / `stress_http` / `stress_ws` binaries (src/bin/stress_*.rs):
stream STORE commands at a running server from N concurrent connections,
report throughput while ingesting, then sample REPLAY / QUERY latency.

Usage:
  sneldb-stress tcp://host:port  (console script; python -m sneldb_spark.tools.stress also works)
  python tools/stress.py tcp://127.0.0.1:7070 [flags]
  python tools/stress.py http://127.0.0.1:8080
  python tools/stress.py ws://127.0.0.1:9090

Parameters follow the reference's env surface (flags override env):
  SNEL_STRESS_EVENTS        total events             (default 10_000)
  SNEL_STRESS_CONCURRENCY   worker connections       (default 16)
  SNEL_STRESS_CONTEXTS      context-id pool size     (default 1_000)
  SNEL_STRESS_EVENT_TYPES   comma-separated types    (default stress_evt)
  SNEL_STRESS_LINK_FIELD    sequence link field      (default user_id)
  SNEL_STRESS_SAMPLE_CTX    ctx for latency samples  (default ctx-500)
  SNEL_STRESS_TS_DAYS       created_at spread (days) (default 30)
Auth (only needed when the server has [auth] enabled):
  SNELDB_ADMIN_USER / SNELDB_ADMIN_KEY — admin credentials; the tool then
  creates a stress user and GRANTs it write, exactly as the reference does.

Schema, payload shape (id / v / flag / created_at / plan enum / link
field) and the closing REPLAY + QUERY latency samples mirror the
reference tool so numbers are comparable across engines.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import string
import sys
import threading
import time

from sneldb_spark.client import SnelDBClient

_PLANS = [f"type{i:02d}" for i in range(1, 21)]
_FIELDS = (
    '{ "id": "u64", "v": "string", "flag": "bool", "created_at": "datetime", '
    '"%s": "u64", "plan": %s }' % ("%s", json.dumps(_PLANS))
)


def _payload(rng: random.Random, seq: int, ts_lo: int, ts_hi: int, link_field: str) -> dict:
    return {
        "id": seq,
        "v": "".join(rng.choices(string.ascii_letters + string.digits, k=12)),
        "flag": seq % 2 == 0,
        "created_at": rng.randint(ts_lo, ts_hi),
        "plan": _PLANS[seq % 20],
        link_field: rng.randint(500, 599),
    }


def run_stress(
    endpoint: str,
    *,
    events: int = 10_000,
    concurrency: int = 16,
    contexts: int = 1_000,
    event_types: tuple[str, ...] = ("stress_evt",),
    link_field: str = "user_id",
    sample_ctx: str = "ctx-500",
    ts_days: int = 30,
    admin: tuple[str, str] | None = None,
    progress: bool = True,
    now: int | None = None,
    batch: int = 1,
) -> dict:
    """Drive the ingest + sample-read workload; returns the summary dict
    the CLI prints as JSON."""
    now = now or int(time.time())
    ts_lo, ts_hi = now - ts_days * 86_400, now

    def connect(user=None, key=None):
        return SnelDBClient(endpoint, user_id=user, secret_key=key, timeout=60.0)

    # Control connection: schema definitions (+ user provisioning when the
    # server runs with auth, mirroring the reference's admin bootstrap).
    worker_auth: tuple[str | None, str | None] = (None, None)
    control = connect(*admin) if admin else connect()
    try:
        for t in event_types:
            control.execute(f"DEFINE {t} FIELDS {_FIELDS % link_field}")
        if admin:
            stress_user, stress_key = "stress_user", "stress-user-key"
            r = control.try_execute(f'CREATE USER {stress_user} WITH KEY "{stress_key}"')
            if not r.ok and "exists" not in (r.message or ""):
                raise RuntimeError(f"CREATE USER failed: {r.message}")
            control.execute(
                f"GRANT WRITE ON {','.join(event_types)} TO {stress_user}"
            )
            worker_auth = (stress_user, stress_key)

        done = threading.Event()
        sent = [0] * concurrency
        errors = [0] * concurrency

        def reporter():
            last, last_t = 0, time.time()
            while not done.wait(2.0):
                cur, t = sum(sent), time.time()
                dt = max(t - last_t, 1e-9)
                print(f"[PROG] total={cur} (+{cur - last}) {(cur - last) / dt:.0f} ev/s")
                last, last_t = cur, t

        def worker(w: int):
            rng = random.Random(1000 + w)  # deterministic per worker
            try:
                c = connect(*worker_auth)
            except Exception:
                errors[w] = events // concurrency
                return
            try:
                def store_cmd(seq: int) -> str:
                    t = event_types[seq % len(event_types)]
                    ctx = f"ctx-{seq % contexts}"
                    body = json.dumps(_payload(rng, seq, ts_lo, ts_hi, link_field))
                    return f"STORE {t} FOR {ctx} PAYLOAD {body}"

                seqs = list(range(w, events, concurrency))
                if batch <= 1:
                    for seq in seqs:
                        r = c.try_execute(store_cmd(seq))
                        if r.ok:
                            sent[w] += 1
                        else:
                            errors[w] += 1
                else:
                    # one BATCH round-trip per `batch` STOREs — how the
                    # reference's clients reach their throughput numbers
                    for i in range(0, len(seqs), batch):
                        chunk = seqs[i:i + batch]
                        cmd = "BATCH " + "; ".join(store_cmd(s) for s in chunk)
                        r = c.try_execute(cmd)
                        if r.ok:
                            sent[w] += len(chunk)
                        else:
                            errors[w] += len(chunk)
            finally:
                c.close()

        threads = [threading.Thread(target=worker, args=(w,)) for w in range(concurrency)]
        rep = threading.Thread(target=reporter, daemon=True)
        start = time.time()
        if progress:
            rep.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        done.set()
        elapsed = time.time() - start
        total = sum(sent)
        if progress:
            print(f"Ingested {total} events in {elapsed:.2f}s ({total / max(elapsed, 1e-9):.0f} ev/s)")

        control.execute("FLUSH")

        # Latency samples over the data just ingested (reference parity:
        # one REPLAY FOR ctx, one SINCE + WHERE QUERY).
        t0 = time.time()
        replay_rows = len(control.query(f"REPLAY {event_types[0]} FOR {sample_ctx}"))
        replay_ms = (time.time() - t0) * 1000
        t0 = time.time()
        query_rows = len(
            control.query(
                f"QUERY {event_types[0]} SINCE {ts_lo} USING created_at WHERE id < 100"
            )
        )
        query_ms = (time.time() - t0) * 1000

        return {
            "endpoint": endpoint,
            "events": total,
            "errors": sum(errors),
            "concurrency": concurrency,
            "elapsed_s": round(elapsed, 3),
            "events_per_sec": round(total / max(elapsed, 1e-9), 1),
            "replay_rows": replay_rows,
            "replay_ms": round(replay_ms, 1),
            "query_rows": query_rows,
            "query_ms": round(query_ms, 1),
        }
    finally:
        control.close()


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("endpoint", help="tcp://h:p | http://h:p | ws://h:p | unix:///path")
    p.add_argument("--events", type=int, default=_env_int("SNEL_STRESS_EVENTS", 10_000))
    p.add_argument(
        "--concurrency", type=int, default=_env_int("SNEL_STRESS_CONCURRENCY", 16)
    )
    p.add_argument("--contexts", type=int, default=_env_int("SNEL_STRESS_CONTEXTS", 1_000))
    p.add_argument(
        "--event-types",
        default=os.environ.get(
            "SNEL_STRESS_EVENT_TYPES",
            os.environ.get("SNEL_STRESS_EVENT_TYPE", "stress_evt"),
        ),
    )
    p.add_argument(
        "--link-field", default=os.environ.get("SNEL_STRESS_LINK_FIELD", "user_id")
    )
    p.add_argument(
        "--sample-ctx", default=os.environ.get("SNEL_STRESS_SAMPLE_CTX", "ctx-500")
    )
    p.add_argument("--ts-days", type=int, default=_env_int("SNEL_STRESS_TS_DAYS", 30))
    p.add_argument(
        "--batch", type=int, default=_env_int("SNEL_STRESS_BATCH", 1),
        help="STOREs per BATCH round-trip (1 = one STORE per round-trip)",
    )
    args = p.parse_args(argv)

    admin = None
    if os.environ.get("SNELDB_ADMIN_USER"):
        admin = (os.environ["SNELDB_ADMIN_USER"], os.environ.get("SNELDB_ADMIN_KEY", ""))

    summary = run_stress(
        args.endpoint,
        events=args.events,
        concurrency=args.concurrency,
        contexts=args.contexts,
        event_types=tuple(t.strip() for t in args.event_types.split(",") if t.strip()),
        link_field=args.link_field,
        sample_ctx=args.sample_ctx,
        ts_days=args.ts_days,
        admin=admin,
        batch=args.batch,
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
