"""Candidate-growth smoke for the banded near-dup families (VERDICT r6
#5): synthesize N docs with a KNOWN near-duplicate structure, run the
MinHash-LSH and SimHash candidate generators, and report candidates per
true pair plus wall time — the number that decides whether "bucketed,
not all-pairs" still holds at 10M docs.

Corpus shape (all JVM-side, no Python in the generator): `2 * n_true`
docs form near-duplicate pairs — each pair shares L tokens except ONE
mutated position, giving shingle Jaccard ~ (L-n-2)/(L+2) (~0.65 at
L=16, n=3), well above the 0.5 verify threshold. The rest are fully
unique docs (disjoint token namespace). True pairs = n_true exactly;
any candidate beyond those (and beyond same-family shingle luck) is
banding noise.

Expected outcome, recorded in BASELINE.md:
- MinHash banding keys are 4 concatenated 64-bit minima — random docs
  essentially never collide, so candidates/true ~ 1 at any corpus size.
- SimHash 16-bit blocks have a RANDOM collision floor of
  blocks * n^2 / 2^(width+1) pairs (~3e9 at 10M docs) — the smoke
  measures the sub-linear sizes and prints the projection, plus the
  blocks=3/max_hamming=2 configuration that keeps it near-linear.

Usage: python tools/smoke_minhash_scale.py [n_docs] [n_true] [simhash_n]
Defaults: 10_000_000 docs, 50_000 true pairs, simhash measured at
min(n_docs, 1_000_000) (its 16-bit default would need hours at 10M —
that cost IS the finding; the projection is printed instead).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the 10M-row signature table (~8 GB columnar) exceeds the engine's 8g
# default heap; the smoke is a scale probe, give it room
os.environ.setdefault("SNELDB_DRIVER_MEM", "24g")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from sneldb_spark.pipeline.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_fingerprints,
    simhash_near_pairs,
)
from sneldb_spark.session import get_spark

L = 16  # tokens per doc
NGRAM = 3


def synth_docs(spark, n: int, n_true: int):
    """(doc_id, text): docs [0, 2*n_true) pair up (family f = id // 2,
    member id % 2 == 1 mutates token at position f % L); the rest are
    unique. Tokens are hex of xxhash64 over disjoint namespaces."""
    base = spark.range(0, n, 1, 64)
    fam = (F.col("id") / 2).cast("long")
    is_dup = F.col("id") < (2 * n_true)
    mut_pos = (fam % L).cast("int")
    is_variant = (F.col("id") % 2 == 1) & is_dup

    def tok(ns: int, key, j: int):
        return F.format_string(
            "t%x", F.abs(F.xxhash64(F.lit(ns), key, F.lit(j)))
        )

    cols = []
    for j in range(L):
        shared = tok(1, fam, j)          # family-shared token
        mutated = tok(2, fam, j)         # the variant's replacement
        unique = tok(3, F.col("id"), j)  # unique-doc namespace
        cols.append(
            F.when(~is_dup, unique)
            .when(is_variant & (mut_pos == j), mutated)
            .otherwise(shared)
        )
    return base.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *cols).alias("text")
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_true = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    sim_n = int(sys.argv[3]) if len(sys.argv) > 3 else min(n, 1_000_000)
    spark = get_spark(app_name="smoke-minhash-scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n, n_true)

    # -- MinHash LSH at full size -----------------------------------------
    t0 = time.perf_counter()
    # DISK_ONLY: the signature table is read three times (banding + both
    # verify sides) but must not compete with shuffle memory at 10M rows
    sigs = minhash_signatures(docs, num_hashes=64, n=NGRAM).persist(
        StorageLevel.DISK_ONLY
    )
    n_sigs = sigs.count()
    t1 = time.perf_counter()
    cand = minhash_lsh_candidates(sigs, bands=16, rows_per_band=4).persist()
    n_cand = cand.count()
    t2 = time.perf_counter()
    s1 = sigs.withColumnRenamed("id", "id1").withColumnRenamed("sig", "sig1")
    s2 = sigs.withColumnRenamed("id", "id2").withColumnRenamed("sig", "sig2")
    verified = (
        cand.join(s1, "id1").join(s2, "id2")
        .withColumn(
            "est_j",
            F.size(F.filter(
                F.zip_with("sig1", "sig2", lambda a, b: a == b), lambda x: x
            )) / F.lit(64),
        )
        .where(F.col("est_j") >= 0.5)
        .count()
    )
    t3 = time.perf_counter()
    cand.unpersist()
    sigs.unpersist()
    print(
        f"minhash n={n} true={n_true}: sigs {t1 - t0:.1f}s, "
        f"candidates={n_cand} ({n_cand / max(n_true, 1):.2f}x true, "
        f"{t2 - t1:.1f}s), verified={verified} "
        f"(recall {verified / max(n_true, 1):.3f}, verify {t3 - t2:.1f}s)"
    )

    # -- SimHash at sim_n (default config), plus the wide-key config -------
    sdocs = synth_docs(spark, sim_n, min(n_true, sim_n // 4))
    strue = min(n_true, sim_n // 4)
    t4 = time.perf_counter()
    fps = simhash_fingerprints(sdocs).persist(StorageLevel.DISK_ONLY)
    fps.count()
    t5 = time.perf_counter()
    p_default = simhash_near_pairs(fps, max_hamming=3, blocks=4).count()
    t6 = time.perf_counter()
    p_wide = simhash_near_pairs(fps, max_hamming=2, blocks=3).count()
    t7 = time.perf_counter()
    fps.unpersist()
    # random-collision floor of the default 16-bit blocks, projected
    proj_10m = 4 * (n ** 2) / 2 ** 17
    print(
        f"simhash n={sim_n} true~{strue}: fp {t5 - t4:.1f}s; "
        f"blocks=4/h<=3 pairs={p_default} ({t6 - t5:.1f}s); "
        f"blocks=3/h<=2 pairs={p_wide} ({t7 - t6:.1f}s); "
        f"projected random-collision candidates at n={n} with 16-bit "
        f"blocks: {proj_10m:.2e}"
    )


if __name__ == "__main__":
    main()
