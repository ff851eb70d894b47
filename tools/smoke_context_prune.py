"""Context file-skip smoke: 2M events, 8 date partitions, 50k contexts,
range-placed layout. Measures a FOR-context point lookup with the footer
prune (EventStore.read_for_context) vs the full-scan compile, plus files
touched by each. Results recorded in BASELINE.md.

Run: python tools/smoke_context_prune.py [n_events]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    root = "/tmp/sneldb_ctx_smoke"
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark(app_name="ctx-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    from sneldb_spark.commands.parser import parse_command
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.plans.compiler import QueryCompiler

    db = SnelDB(spark, root)
    db.store.registry.define("visit", {"v": "int"})
    day = 86_400
    base = 1_700_000_000
    frame = (
        spark.range(n)
        .select(
            F.format_string("u%07d", (F.col("id") * 2654435761) % 50_000).alias("context_id"),
            F.lit("visit").alias("event_type"),
            (F.lit(base) + (F.col("id") % 8) * day + F.col("id") % 1000).alias("timestamp"),
            F.col("id").alias("event_id"),
            (F.col("id") % 97).cast("int").alias("v"),
        )
    )
    t0 = time.perf_counter()
    db.store.append_dataframe("visit", frame)
    print(f"ingest {n} rows: {time.perf_counter()-t0:.2f}s")

    total_files = (
        db.store.read("visit").select(F.input_file_name()).distinct().count()
    )
    ctx = "u0025000"

    t0 = time.perf_counter()
    pruned_rows = db.query(f"QUERY visit FOR {ctx}").count()
    t_pruned = time.perf_counter() - t0
    src = db.store.read_for_context("visit", ctx)
    pruned_files = src.select(F.input_file_name()).distinct().count()

    full_compiler = QueryCompiler(
        source=db.store.read,
        schema_lookup=db.compiler._schema,
        time_config=db.compiler.time_config,
    )
    t0 = time.perf_counter()
    full_rows = full_compiler.compile(
        parse_command(f"QUERY visit FOR {ctx}")
    ).count()
    t_full = time.perf_counter() - t0

    assert pruned_rows == full_rows, (pruned_rows, full_rows)
    print(
        f"FOR {ctx}: {pruned_rows} rows | files {pruned_files}/{total_files}"
        f" | pruned {t_pruned:.2f}s vs full {t_full:.2f}s"
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
