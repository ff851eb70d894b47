"""Scale smoke for bpe_train's driver-side merge loop: synthesize a
large distinct-word corpus, then time the collect + incremental merge
loop (and optionally the pre-r5 full-rescan loop for comparison).

Usage: python tools/smoke_bpe.py [n_words] [n_merges] [--naive]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sneldb_spark.pipeline.text import bpe_train
from sneldb_spark.session import get_spark


def naive_merge_loop(vocab: dict, num_merges: int):
    """The pre-round-5 algorithm: full vocabulary rescan per merge."""
    from collections import Counter

    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for syms, wc in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += wc
        if not counts:
            break
        (l, r), c = max(counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if c < 2:
            break
        merges.append((l, r))
        nxt = {}
        for syms, wc in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + wc
        vocab = nxt
    return merges


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    merges = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    run_naive = "--naive" in sys.argv
    spark = get_spark(app_name="smoke-bpe")
    spark.sparkContext.setLogLevel("ERROR")

    # ~n distinct pseudo-words, 3-10 chars from a 20-letter alphabet,
    # zipf-ish counts: word i occurs max(1, n // (i + 1)) times — the
    # long tail is count-1, like a web corpus's URL/typo garbage.
    words = (
        spark.range(0, n, 1, 32)
        .select(
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(
                        F.lit(0), (F.col("id") % 8 + 2).cast("int")
                    ),
                    lambda i: F.chr(
                        (F.xxhash64(F.col("id"), i) % 20 + 20) % 20 + 97
                    ),
                ),
            ).alias("word"),
            F.greatest(
                F.lit(1), (F.lit(n) / (F.col("id") + 1)).cast("long")
            ).alias("n_rep"),
        )
        .select(
            F.concat_ws(
                " ", F.array_repeat(F.col("word"), F.col("n_rep").cast("int"))
            ).alias("text")
        )
    )
    df = words.select(F.lit(1).alias("doc_id"), "text")

    t0 = time.perf_counter()
    got = bpe_train(df, num_merges=merges, min_word_count=1)
    t1 = time.perf_counter()
    print(
        f"words~{n} merges={len(got)} incremental_total={t1 - t0:.1f}s "
        f"(collect+loop)"
    )
    t2 = time.perf_counter()
    got2 = bpe_train(df, num_merges=merges, min_word_count=2)
    t3 = time.perf_counter()
    print(
        f"words~{n} min_word_count=2 merges={len(got2)} "
        f"total={t3 - t2:.1f}s"
    )

    if run_naive:
        rows = (
            df.select(
                F.explode(
                    F.filter(
                        F.split(F.lower(F.col("text")), r"\W+"),
                        lambda x: x != "",
                    )
                ).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("wc"))
            .collect()
        )
        vocab = {tuple(r["w"]): r["wc"] for r in rows}
        t4 = time.perf_counter()
        naive = naive_merge_loop(vocab, merges)
        t5 = time.perf_counter()
        assert naive == got, "naive and incremental merge lists diverged"
        print(f"naive_loop={t5 - t4:.1f}s (same merges)")


if __name__ == "__main__":
    main()
