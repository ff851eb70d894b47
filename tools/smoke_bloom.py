"""Scale smoke for Parquet bloom-filter row-group skipping: 2M events in
ONE date partition, point-miss equality probes timed with blooms on vs
off. context_id is covered by the range layout's footer min/max already;
the bloom's win is equality on NON-sort-key string fields (here `sku`),
where every file's min/max envelope spans the whole domain. Records the
numbers quoted in BASELINE.md."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sneldb_spark.session import get_spark
from sneldb_spark.store.event_store import EventStore

ROWS = 2_000_000


def build(spark, root: str, bloom: bool):
    store = EventStore(spark, root, wal=False, bloom_filters=bloom)
    store.registry.define("visit", {"sku": "string", "v": "int"})
    df = spark.range(ROWS).select(
        F.concat(F.lit("ctx-"), F.md5(F.col("id").cast("string"))).alias("context_id"),
        F.lit("visit").alias("event_type"),
        (F.lit(1_700_000_000) + F.col("id") % 86_400).alias("timestamp"),
        F.col("id").alias("event_id"),
        # high-cardinality, NOT part of the (context_id, ts) sort key —
        # its per-file min/max spans the whole domain, so only the bloom
        # (or a full decode) can answer a point probe
        F.concat(F.lit("sku-"), F.md5((F.col("id") + 7).cast("string"))).alias("sku"),
        F.col("id").alias("v"),
    )
    store.append_dataframe("visit", df)
    return store


def best_of(n, fn):
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return min(times)


def main():
    spark = get_spark(app_name="smoke-bloom", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    miss = "sku-deadbeefdeadbeefdeadbeefdeadbeef"
    out = {}
    for label, bloom in (("off", False), ("on", True)):
        root = tempfile.mkdtemp(prefix=f"bloom_{label}_")
        store = build(spark, root, bloom)
        df = store.read("visit")
        df.count()  # warm file listing
        out[label] = {
            "miss_s": round(best_of(3, lambda: df.filter(F.col("sku") == miss).count()), 3),
            "bytes": sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(root)
                for f in fs
                if f.endswith(".parquet")
            ),
        }
    print(
        f"rows={ROWS} point-miss scan: bloom_off={out['off']['miss_s']}s "
        f"bloom_on={out['on']['miss_s']}s "
        f"({out['off']['miss_s'] / max(out['on']['miss_s'], 1e-9):.1f}x); "
        f"bytes off={out['off']['bytes']} on={out['on']['bytes']} "
        f"(+{(out['on']['bytes'] - out['off']['bytes']) / out['off']['bytes'] * 100:.1f}%)"
    )


if __name__ == "__main__":
    main()
