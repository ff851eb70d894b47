"""Scale smoke for DSIR data selection: synthesize a raw corpus with a
KNOWN target-like minority, run dsir_resample, and report wall time plus
selection precision — the number that decides whether the hashed-n-gram
importance path stays linear and actually finds the target-distribution
docs at corpus scale.

Corpus shape (all JVM-side, no Python in the generator): every doc is
L tokens. A `good_frac` minority of raw docs draws tokens from the
TARGET vocabulary ("a<h mod Va>"); the rest draw from a disjoint web
vocabulary ("b<h mod Vb>"). The target corpus is `n_target` pure-A docs.
A perfect selector's top-k is all-good; precision = good fraction of the
selected k.

Expected outcome (recorded in BASELINE.md): precision ~1.0 once
k << n*good_frac, wall time ~linear in n (the path is two raw scans +
one target scan, all ending in <=num_buckets-key aggregates; the only
join is bucket-keyed against the <=10k-row log-ratio table).

Usage: python tools/smoke_dsir_scale.py [n_raw] [n_target] [k]
Defaults: 10_000_000 raw docs, 100_000 target docs, k=10_000.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SNELDB_DRIVER_MEM", "24g")

from pyspark.sql import functions as F

from sneldb_spark.pipeline.sampling import dsir_resample
from sneldb_spark.session import get_spark

L = 16         # tokens per doc
VA = 5_000     # target vocabulary size
VB = 50_000    # web vocabulary size
GOOD_FRAC = 0.1


def synth(spark, n: int, vocab: str, vsize: int, id_off: int, parts: int):
    """(doc_id, text): L-token docs over one vocabulary namespace."""
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda i: F.concat(
            F.lit(vocab),
            (F.abs(F.xxhash64(F.col("id"), i, F.lit(vocab))) % vsize).cast("string"),
        ),
    )
    return spark.range(0, n, 1, parts).select(
        (F.col("id") + id_off).alias("doc_id"),
        F.concat_ws(" ", toks).alias("text"),
    )


def main() -> None:
    n_raw = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_target = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark(app_name="dsir-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    n_good = int(n_raw * GOOD_FRAC)
    good = synth(spark, n_good, "a", VA, 0, 32)
    web = synth(spark, n_raw - n_good, "b", VB, n_good, 64)
    raw = good.unionByName(web)
    target = synth(spark, n_target, "a", VA, 1_000_000_000, 16)

    t0 = time.perf_counter()
    sel = dsir_resample(raw, target, k).select("id").collect()
    dt = time.perf_counter() - t0
    ids = [r["id"] for r in sel]
    precision = sum(1 for i in ids if i < n_good) / max(len(ids), 1)
    print(
        f"n_raw={n_raw:,} n_target={n_target:,} k={k:,}: "
        f"{dt:.1f}s  precision={precision:.4f}  selected={len(ids):,}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
