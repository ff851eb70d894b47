"""Seeding-cost smoke: k-means|| (`clustering.parallel_seed`) vs the
sequential k-means++ draw at growing k over a synthetic 1M-vector
corpus — the number behind "use init='parallel' for large nlist".

The sequential ++ costs one corpus scan per centroid (O(k) scans); the
parallel variant is a fixed number of rounds (O(1) scans in k, wider
GEMMs per round). The smoke times both at small k and parallel alone at
the k where sequential would be impractical, and checks list balance
(max/mean corpus rows per seed's Voronoi cell — the quantity that
decides IVF probe hot-spotting).

Usage: python tools/smoke_seed_scale.py [n_vectors] [dim] [k_small] [k_large]
Defaults: 1_000_000 vectors, 32 dims, k_small=16, k_large=256.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from sneldb_spark.pipeline.clustering import parallel_seed
from sneldb_spark.pipeline.similarity import _spherical_plusplus_seed
from sneldb_spark.session import get_spark


def synth(spark, n: int, dim: int):
    """Deterministic synthetic embeddings: per-coordinate hash-uniform in
    [-1, 1), mildly clustered by a per-row group offset so seeding has
    structure to find."""
    g = (F.col("id") % 32).cast("double")
    cols = [
        (
            (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2000)) / 1000.0 - 1.0)
            + F.when((F.col("id") % 32) == (j % 32), g / 8.0).otherwise(0.0)
        ).alias(f"c{j}")
        for j in range(dim)
    ]
    return spark.range(0, n, 1, 64).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
    )


def balance(df, cents: np.ndarray) -> float:
    """max/mean corpus rows per nearest-seed cell (cosine)."""
    from sneldb_spark.pipeline.similarity import ivf_assignments  # noqa: F401

    import pandas as pd
    from pyspark.sql import types as T

    C = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def count_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            asn = (m @ C.T).argmax(axis=1)
            cnt = np.bincount(asn, minlength=len(C))
            nz = np.flatnonzero(cnt)
            yield pd.DataFrame({"cl": nz.astype(np.int32), "n": cnt[nz]})

    schema = T.StructType(
        [T.StructField("cl", T.IntegerType()), T.StructField("n", T.LongType())]
    )
    pdf = (
        df.select("embedding").mapInPandas(count_fn, schema=schema)
        .groupBy("cl").agg(F.sum("n").alias("n")).toPandas()
    )
    counts = np.zeros(len(C))
    for cl, n in zip(pdf["cl"], pdf["n"]):
        counts[int(cl)] = n
    return float(counts.max() / max(counts.mean(), 1.0))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k_small = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    k_large = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    spark = get_spark(app_name="smoke-seed-scale")
    spark.sparkContext.setLogLevel("ERROR")

    df = synth(spark, n, dim).persist()
    df.count()

    t0 = time.perf_counter()
    pp = _spherical_plusplus_seed(df, k_small, "vec_id", "embedding")
    t1 = time.perf_counter()
    par_s = parallel_seed(df, k_small, "vec_id", "embedding", metric="cosine")
    t2 = time.perf_counter()
    par_l = parallel_seed(df, k_large, "vec_id", "embedding", metric="cosine")
    t3 = time.perf_counter()
    b_pp = balance(df, pp)
    b_ps = balance(df, par_s)
    b_pl = balance(df, par_l)
    print(
        f"n={n} dim={dim}: k={k_small} plusplus {t1 - t0:.1f}s "
        f"(balance {b_pp:.2f}) vs parallel {t2 - t1:.1f}s (balance {b_ps:.2f}); "
        f"k={k_large} parallel {t3 - t2:.1f}s (balance {b_pl:.2f}; "
        f"plusplus would need {k_large - 1} corpus scans ~ "
        f"{(t1 - t0) / max(k_small - 1, 1) * (k_large - 1):.0f}s extrapolated)"
    )


if __name__ == "__main__":
    main()
