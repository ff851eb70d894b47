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
    df.unpersist()


if __name__ == "__main__":
    main()
