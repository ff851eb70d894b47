"""Clone-flood smoke for near-dedup: what happens to LSH banding when a
corpus carries E byte-identical copies of the same document (error
pages, boilerplate, mirrors — routine in web crawls), and that
`minhash_assign`'s exact-collapse keeps the whole pipeline linear.

Naive banding puts all E clones in the same bucket of EVERY band:
E*(E-1)/2 candidate pairs before verification, and the verified pair
list itself is quadratic output. The smoke measures the naive candidate
count at growing flood sizes (the quadratic is visible long before it
is dangerous), then runs `minhash_assign` end-to-end at the full corpus
with the full flood and reports the rep-space candidate count (flat)
and wall time.

Corpus: `n_docs` total — one flood of `flood` identical docs, plus
`n_true` near-dup pairs (same shape as smoke_minhash_scale.py: L-token
docs differing in one position, Jaccard ~0.65), rest unique.

Usage: python tools/smoke_clone_flood.py [n_docs] [flood] [n_true]
Defaults: 1_000_000 docs, 100_000-clone flood, 20_000 true pairs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SNELDB_DRIVER_MEM", "16g")

from pyspark.sql import functions as F

from sneldb_spark.pipeline.dedup import (
    minhash_assign,
    minhash_lsh_candidates,
    minhash_signatures,
)
from sneldb_spark.session import get_spark

L = 16  # tokens per doc


def corpus(spark, n_docs: int, flood: int, n_true: int):
    """All-JVM generator. doc ids: [0, flood) clones of one text,
    [flood, flood + 2*n_true) near-dup pairs, rest unique."""
    base = spark.range(0, n_docs, 1, 64).withColumnRenamed("id", "doc_id")
    pair_lo, pair_hi = flood, flood + 2 * n_true
    # family id: clones share family -1; pair members share (id-lo)//2;
    # uniques get their own namespace
    fam = (
        F.when(F.col("doc_id") < pair_lo, F.lit(-1))
        .when(F.col("doc_id") < pair_hi, (F.col("doc_id") - pair_lo) / 2)
        .otherwise(F.col("doc_id") + n_docs)
    ).cast("long")
    is_pair = (F.col("doc_id") >= pair_lo) & (F.col("doc_id") < pair_hi)
    mut_pos = F.pmod(F.col("doc_id"), F.lit(L))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(L - 1)),
        lambda i: F.when(
            is_pair & (i == mut_pos),
            F.concat(F.lit("m"), F.col("doc_id").cast("string")),
        ).otherwise(F.concat(F.lit("t"), fam.cast("string"), F.lit("_"), i.cast("string"))),
    )
    return base.withColumn("text", F.array_join(toks, " "))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    flood = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_true = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    spark = get_spark(app_name="clone-flood-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"n_docs={n_docs} flood={flood} n_true={n_true}")

    # 1) the quadratic, measured at growing flood sizes on a small corpus
    print("naive banding candidates vs flood size (10k-doc corpus):")
    for e in (1_000, 3_000, 10_000):
        df = corpus(spark, 10_000, e, 0)
        t0 = time.time()
        c = minhash_lsh_candidates(minhash_signatures(df, "doc_id", "text", 64, 3), 16, 4).count()
        print(f"  flood={e:>6}: candidates={c:>12,} (E^2/2={e * (e - 1) // 2:,}) "
              f"{time.time() - t0:.1f}s")

    # 2) minhash_assign end-to-end at full size with the full flood
    df = corpus(spark, n_docs, flood, n_true).persist()
    df.count()
    # rep-space candidate count: what the LSH join actually sees
    reps = (
        df.groupBy(F.md5("text").alias("dg"))
        .agg(F.min("doc_id").alias("doc_id"), F.first("text").alias("text"))
    )
    t0 = time.time()
    rep_cands = minhash_lsh_candidates(
        minhash_signatures(reps, "doc_id", "text", 64, 3), 16, 4
    ).count()
    print(f"assign-path candidates over reps: {rep_cands:,} "
          f"(true pairs {n_true:,}; flood contributes 0) {time.time() - t0:.1f}s")

    t0 = time.time()
    out = minhash_assign(df, threshold=0.5)
    n_rows = out.count()
    flood_cluster = out.where(F.col("cluster_id") == 0).count()
    wall = time.time() - t0
    print(f"minhash_assign end-to-end: {wall:.1f}s, rows={n_rows:,} "
          f"(linear: one per doc), flood cluster size={flood_cluster:,}")
    assert n_rows == n_docs
    assert flood_cluster == flood
    print("SMOKE OK")


if __name__ == "__main__":
    main()
