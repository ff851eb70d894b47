"""Scale smoke for incremental sequence materialization: ingest N events,
REMEMBER a funnel, ingest a small delta, and compare the SHOW refresh
cost against a full recompute of the same query. The point of the delta
design is that SHOW scales with the DELTA (plus carried state), not the
history — this prints both numbers.

Usage: python tools/smoke_incremental_seq.py [n_events] [delta_events]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sneldb_spark.engine import SnelDB
from sneldb_spark.session import get_spark


def synth(spark, n, id_base, ts_base, n_users=50_000):
    return spark.range(n).select(
        F.concat(F.lit("u"), ((F.col("id") / 2).cast("long") % n_users)).alias("context_id"),
        F.when(F.col("id") % 2 == 0, "signup").otherwise("purchase").alias(
            "event_type"
        ),
        (F.lit(ts_base) + (F.col("id") / 100).cast("long")).alias("timestamp"),
        (F.lit(id_base) + F.col("id")).alias("event_id"),
        (F.col("id") % 997).cast("int").alias("k"),
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    delta = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="smoke-incr-seq", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="smoke_incr_seq_")
    try:
        db = SnelDB(spark, root)
        for et in ("signup", "purchase"):
            db.store.registry.define(et, {"k": "int"})
        cols = ["context_id", "event_type", "timestamp", "event_id", "k"]

        t0 = time.perf_counter()
        base = synth(spark, n, 1_000_000_000, 1_700_000_000)
        for et in ("signup", "purchase"):
            db.store.append_dataframe(et, base.where(F.col("event_type") == et).select(cols))
        print(f"ingest {n}: {time.perf_counter()-t0:.1f}s", flush=True)

        q = "QUERY signup FOLLOWED BY purchase LINKED BY context_id"
        t0 = time.perf_counter()
        db.execute(f"REMEMBER {q} AS funnel")
        print(f"REMEMBER (full match + state): {time.perf_counter()-t0:.1f}s", flush=True)

        d = synth(spark, delta, 2_000_000_000, 1_700_000_000 + n // 100 + 10)
        for et in ("signup", "purchase"):
            db.store.append_dataframe(et, d.where(F.col("event_type") == et).select(cols))

        t0 = time.perf_counter()
        shown = db.execute("SHOW funnel").df.count()
        t_show = time.perf_counter() - t0
        t0 = time.perf_counter()
        full = db.query(q).count()
        t_full = time.perf_counter() - t0
        print(f"SHOW (incremental refresh): {t_show:.1f}s  ({shown} pairs)", flush=True)
        print(f"full recompute of the query: {t_full:.1f}s  ({full} pairs)", flush=True)
        assert shown == full, (shown, full)
        print("pair counts equal: OK", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
