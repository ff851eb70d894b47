"""Scale smoke for percentile aggregates: 8M values on ONE group (the
worst case — the exact SQL `percentile` buffers every group value in its
aggregation state, percentile_approx keeps a bounded sketch), plus a
100k-group spread. Records the numbers quoted in BASELINE.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sneldb_spark.session import get_spark

ROWS = 8_000_000


def timed(fn):
    t0 = time.time()
    r = fn()
    return time.time() - t0, r


def main():
    spark = get_spark(app_name="smoke-pct", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(ROWS).select(
        (F.col("id") % 100_000).alias("g"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1_000_003))).alias("v"),
    )
    df = df.persist()
    df.count()

    for label, expr in (
        ("exact", F.percentile(F.col("v"), F.lit(0.9))),
        ("approx", F.percentile_approx(F.col("v"), F.lit(0.9), F.lit(10_000))),
    ):
        t_hot, r_hot = timed(lambda e=expr: df.agg(e.alias("p")).collect())
        t_spread, _ = timed(
            lambda e=expr: df.groupBy("g").agg(e.alias("p")).count()
        )
        print(
            f"{label}: one-group(8M values) {t_hot:.2f}s p90={r_hot[0]['p']:.1f} | "
            f"100k-groups {t_spread:.2f}s"
        )
    # incremental-refresh shape: two half-corpus partial states (the
    # materializer's stored state + a delta), merged and finalized —
    # must equal the direct percentile bit-for-bit, and cost about one
    # extra pass over the values (the state arrays concatenate)
    from sneldb_spark.commands.ast import AggSpec
    from sneldb_spark.plans.aggregates import (
        apply_partial_aggregation,
        finalize_partial_state,
        merge_partial_states,
    )

    specs = [AggSpec(op="p90", field="v")]
    resolve = lambda f: (F.col(f), None)  # noqa: E731

    def merged():
        halves = [
            apply_partial_aggregation(
                df.where(cond), specs, ["g"], resolve
            )[0]
            for cond in (F.col("id") % 2 == 0, F.col("id") % 2 == 1)
        ]
        state = merge_partial_states(
            halves[0].unionByName(halves[1]), specs, ["g"]
        )
        return finalize_partial_state(state, specs, ["g"])

    df2 = spark.range(ROWS).select(
        F.col("id"),
        (F.col("id") % 100_000).alias("g"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1_000_003))).alias("v"),
    ).persist()
    df2.count()
    df = df2
    t_direct, direct = timed(
        lambda: {
            r["g"]: r["p"]
            for r in df.groupBy("g")
            .agg(F.percentile(F.col("v"), F.lit(0.9)).alias("p"))
            .collect()
        }
    )
    t_merge, got = timed(
        lambda: {r["g"]: r["p90_v"] for r in merged().collect()}
    )
    n_diff = sum(1 for g in direct if direct[g] != got[g])
    print(
        f"incremental: direct {t_direct:.2f}s | split+merge+finalize "
        f"{t_merge:.2f}s | bit-diff groups: {n_diff} of {len(direct)}"
    )
    assert n_diff == 0
    df2.unpersist()


if __name__ == "__main__":
    main()
