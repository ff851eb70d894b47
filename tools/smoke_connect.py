"""Spark Connect compatibility smoke (VERDICT r6 #4).

Two layers:

1. **Static audit** (always runs; no Connect deps needed): walk the
   package for classic-only API usage — `sparkContext`, `df.rdd`,
   `._jvm`/`._jsc`, `applyInPandasWithState` — and check the set of
   files using them matches the DOCUMENTED compat table below. Adding a
   new classic-only call without updating the table fails the audit
   (and the pytest lane in tests/test_connect.py).

2. **Live smoke** (runs when the Connect client deps are installed —
   `grpcio` etc., absent in this container): builds a
   `SparkSession.builder.remote("local[4]")` session and drives the
   engine's batch path (DEFINE / STORE / FLUSH / filter / aggregate /
   sequence QUERY) end-to-end against it.

Compat table (SURVEY "Spark Connect" section mirrors this):

- **Works under Connect** (pure DataFrame API, Arrow kernels):
  the whole batch query path (filters, aggregates, time buckets,
  sequences, ORDER/LIMIT, COMPARE/PlotQL), the pipeline operator
  families (dedup/similarity/text/sampling/packing/analytics — all
  mapInPandas/applyInPandas + built-ins), materializer refresh logic,
  `ensure_min_partitions` (Connect-aware fallback, pipeline/__init__).
- **Needs a client-visible shared filesystem**: the engine's own
  metadata (schema registry, WAL, manifests) is written with plain
  file IO on the CLIENT while parquet IO happens on the SERVER — under
  Connect the store root must be a path both sides see (local[*]
  Connect trivially satisfies this).
- **Classic-only**: `applyInPandasWithState` streaming operators
  (streaming/sequence.py, streaming/sessionize.py) — upstream Connect
  support exists in Spark 4.x but is unverified here (client deps
  absent); the writer-lock flock (store/event_store.py) is client-side
  and works wherever the store root does.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "sneldb_spark")

# file (relative to sneldb_spark/) -> why it is allowed to touch a
# classic-only API
ALLOWED_CLASSIC = {
    "pipeline/__init__.py": "sparkContext/rdd probes wrapped in Connect "
                            "fallbacks (documented, tested)",
    "streaming/sequence.py": "applyInPandasWithState stateful matchers "
                             "(classic-verified; Connect untested here)",
    "streaming/sessionize.py": "applyInPandasWithState sessionizer "
                               "(classic-verified; Connect untested here)",
    "session.py": "quiet_logs(): best-effort setLogLevel wrapped in a "
                  "Connect-safe no-op fallback",
    "store/event_store.py": "flush workers inherit the caller's "
                            "scheduler pool via sparkContext."
                            "getLocalProperty, wrapped in a Connect-safe "
                            "fallback (pools are classic-only; workers "
                            "then run in the server default pool)",
    "store/materialize.py": "_parallel_writes state-write workers inherit "
                            "the caller's scheduler pool via sparkContext."
                            "getLocalProperty, wrapped in the same "
                            "Connect-safe fallback as event_store.py",
    "tools/soak.py": "soak harness is classic-local by definition (it "
                     "boots its own server + local session); the cached-"
                     "RDD-bytes metric reads the JVM RDDStorageInfo via "
                     "_jsc behind a try/except",
}

_CLASSIC_RE = re.compile(
    r"\.sparkContext\b|\.rdd\b|\._jvm\b|\._jsc\b|applyInPandasWithState"
)


def audit() -> int:
    """Return 0 when every classic-only API use is in ALLOWED_CLASSIC."""
    offenders: dict[str, list[int]] = {}
    for dirpath, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, PKG)
            with open(p) as f:
                for i, line in enumerate(f, 1):
                    code = line.split("#", 1)[0]
                    if _CLASSIC_RE.search(code):
                        offenders.setdefault(rel, []).append(i)
    unexpected = {k: v for k, v in offenders.items() if k not in ALLOWED_CLASSIC}
    stale = [k for k in ALLOWED_CLASSIC if k not in offenders]
    print(f"classic-only API files: {sorted(offenders)}")
    if unexpected:
        print(f"AUDIT FAIL — undocumented classic-only usage: {unexpected}")
        return 1
    if stale:
        print(f"note: allowed entries with no remaining usage: {stale}")
    print("AUDIT OK — classic-only usage matches the documented table")
    return 0


def live() -> int:
    try:
        import grpc  # noqa: F401
    except ImportError:
        print("LIVE SKIP: grpcio not installed (Connect client deps absent "
              "in this container) — static audit only")
        return 0
    import tempfile

    from pyspark.sql import SparkSession

    from sneldb_spark.engine import SnelDB

    spark = SparkSession.builder.remote("local[4]").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="smoke_connect_")
    db = SnelDB(spark, root, multi_link=True)
    db.execute('DEFINE view FIELDS { "u": "string", "n": "int" }')
    db.execute('DEFINE buy FIELDS { "u": "string", "n": "int" }')
    for i in range(6):
        db.execute(f'STORE view FOR c{i} PAYLOAD {{ "u": "u{i % 2}", "n": {i} }}')
        db.execute(f'STORE buy FOR c{i} PAYLOAD {{ "u": "u{i % 2}", "n": {i} }}')
    db.execute("FLUSH")
    n = db.query("QUERY view WHERE n >= 2").count()
    agg = db.query("QUERY view COUNT BY u").collect()
    seq = db.query("QUERY view FOLLOWED BY buy LINKED BY u").count()
    print(f"LIVE OK: filter={n} agg_groups={len(agg)} seq={seq}")
    return 0


if __name__ == "__main__":
    rc = audit()
    rc = live() or rc
    sys.exit(rc)
