"""Wall-time pruning smoke at 50M events (VERDICT r5 #6): the 2M smokes
show the context file-skip and top-k zone skip winning STRUCTURALLY
(files opened) while the ~0.2 s threaded footer sweep exceeds the IO it
saves at toy scale. This smoke ingests >=50M events through the real
range-placed layout (EventStore.append_dataframe: 16 ingest dates,
contiguous context ranges per file) and times, against the full-scan
compile of the SAME query:

- `FOR <context>` point lookup (EventStore.read_for_context footer prune)
- `ORDER BY timestamp DESC LIMIT 100` (EventStore.read_topk RLTE-style
  footer bound, store/topk_prune.py)

Both paths assert hash-identical results vs the full scan. Numbers are
recorded in BASELINE.md.

Run: python tools/smoke_prune_scale.py [n_events]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sneldb_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    root = "/tmp/sneldb_prune_scale_smoke"
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark(app_name="prune-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    from sneldb_spark.commands.parser import parse_command
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.plans.compiler import QueryCompiler

    # Emulate the wide layout a real cluster produces: many contiguous
    # context-range slabs per ingest date (a 1000-executor ingest writes
    # hundreds of range files per date; local default 32 would give only
    # ~3 per date, hiding the skip inside one task wave).
    spark.conf.set("spark.sql.shuffle.partitions", "256")
    # ... and AQE would coalesce those 256 range slabs right back to
    # ~64MB targets on this small-for-a-cluster dataset; pin the slab
    # count so the layout matches the wide-cluster shape under test
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    db = SnelDB(spark, root)
    db.store.registry.define("visit", {"v": "int"})
    day = 86_400
    base = 1_700_000_000
    frame = spark.range(n).select(
        F.format_string("u%07d", (F.col("id") * 2654435761) % 200_000).alias(
            "context_id"
        ),
        F.lit("visit").alias("event_type"),
        # 16 ingest dates; within a date timestamps spread over the day,
        # so ORDER BY timestamp DESC bounds to the newest date's files
        (
            F.lit(base)
            + (F.col("id") % 16) * day
            + (F.col("id") * 48271) % day
        ).alias("timestamp"),
        F.col("id").alias("event_id"),
        (F.col("id") % 97).cast("int").alias("v"),
    )
    t0 = time.perf_counter()
    db.store.append_dataframe("visit", frame)
    print(f"ingest {n} rows: {time.perf_counter() - t0:.1f}s")

    # full-scan twin: same compiler, no pruning sources attached
    full_compiler = QueryCompiler(
        source=db.store.read,
        schema_lookup=db.compiler._schema,
        time_config=db.compiler.time_config,
    )

    def run(cmd: str, key_cols: list[str]):
        # Steady state, fair on both sides: the COMPILE (which is where
        # the pruned path pays its footer sweep) plus the scan are timed
        # together, and each side runs twice with the first (codegen +
        # file-listing warmup) discarded.
        def once(compiler):
            t0 = time.perf_counter()
            df = compiler.compile(parse_command(cmd))
            rows = sorted(tuple(r) for r in df.select(*key_cols).collect())
            return rows, time.perf_counter() - t0

        # compare the key-column MULTISET: a LIMIT boundary tie may pick
        # different rows per plan, but the top-n key values are unique
        once(db.compiler)
        pruned, t_pruned = once(db.compiler)
        once(full_compiler)
        full, t_full = once(full_compiler)
        assert pruned == full, (cmd, len(pruned), len(full))
        return len(pruned), t_pruned, t_full

    total_files = db.store.read("visit").select(F.input_file_name()).distinct().count()
    ctx = "u0123457"
    n_rows, t_p, t_f = run(f"QUERY visit FOR {ctx}", ["event_id"])
    ctx_files = (
        db.store.read_for_context("visit", ctx)
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    print(
        f"FOR {ctx}: {n_rows} rows | files {ctx_files}/{total_files} "
        f"| pruned {t_p:.2f}s vs full {t_f:.2f}s ({t_f / t_p:.1f}x)"
    )

    topk_src = db.store.read_topk("visit", "timestamp", 100, desc=True)
    topk_files = topk_src.select(F.input_file_name()).distinct().count()
    n_rows, t_p, t_f = run(
        "QUERY visit ORDER BY timestamp DESC LIMIT 100", ["timestamp"]
    )
    print(
        f"ORDER BY timestamp DESC LIMIT 100: {n_rows} rows "
        f"| files {topk_files}/{total_files} "
        f"| pruned {t_p:.2f}s vs full {t_f:.2f}s ({t_f / t_p:.1f}x)"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
