"""Scale smoke for multi-link chains: synthesize N events over K link
keys (3 event types round-robin along each key's timeline), run the
3-step chain matcher plain and time-sliced, and the funnel report.

Usage: python tools/smoke_chain.py [n_events] [n_keys]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sneldb_spark.commands.ast import FOLLOWED_BY
from sneldb_spark.plans.sequence import funnel_report, sequence_match_chain
from sneldb_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark(app_name="smoke-chain")
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        spark.range(0, n, 1, 64)
        .select(
            (F.col("id") % keys).cast("string").alias("link"),
            F.col("id").alias("timestamp"),
            F.col("id").alias("event_id"),
            (F.col("id") % 3).alias("side"),
        )
        .persist()
    )
    frames = [base.where(F.col("side") == s).drop("side") for s in range(3)]
    base.count()

    kinds = [FOLLOWED_BY, FOLLOWED_BY]
    t0 = time.perf_counter()
    plain = sequence_match_chain(frames, "link", kinds).count()
    t1 = time.perf_counter()
    sliced = sequence_match_chain(frames, "link", kinds, n_slices=16).count()
    t2 = time.perf_counter()
    rep = funnel_report(frames, "link", kinds).collect()
    t3 = time.perf_counter()
    assert plain == sliced
    print(
        f"events={n} keys={keys} chains={plain} "
        f"plain={t1 - t0:.1f}s sliced16={t2 - t1:.1f}s funnel={t3 - t2:.1f}s"
    )
    for r in sorted(rep, key=lambda r: r["step"]):
        print(f"  step {r['step']} reached={r['reached']} overall={r['overall']}")


if __name__ == "__main__":
    main()
