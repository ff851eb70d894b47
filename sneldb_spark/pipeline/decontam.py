"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM / Llama
style): any training doc containing enough verbatim n-grams from a held-out
benchmark is contaminated and must be dropped before training.

Scale design: the benchmark side is small by nature (eval sets are
thousands of documents, not billions), so its distinct shingle-hash set is
**broadcast** — the training corpus streams through one narrow
explode + broadcast-hash-join + partial-count aggregation. No shuffle of
the corpus, no driver collection of corpus data; the only shuffle key is
the training doc id for the final per-doc rollup, which partial (map-side)
aggregation keeps tiny. Shingles are 64-bit blake2b hashes computed by the
same Arrow-batched kernel the dedup family uses
(``dedup.shingle_hash_arrays``), so candidates join on 8-byte longs, never
strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sneldb_spark.pipeline.dedup import shingle_hash_arrays


def ngram_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    frac_threshold: float = 0.1,
) -> DataFrame:
    """Per training doc: how much of it appears verbatim (as word n-grams)
    in the benchmark set.

    Returns (id, n_shingles, n_matched, overlap_frac, contaminated) where
    ``n_matched`` counts the doc's *distinct* shingles that occur anywhere
    in the benchmark and ``contaminated`` is
    ``n_matched >= min_hits AND overlap_frac >= frac_threshold``.
    Docs shorter than one shingle are kept with zero overlap.
    """
    bench_shingles = (
        shingle_hash_arrays(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select(F.explode("h").alias("h"))
        .distinct()
    )
    train_sh = shingle_hash_arrays(train, id_col=id_col, text_col=text_col, n=n)
    hits = (
        train_sh.select("id", F.explode("h").alias("h"))
        .join(F.broadcast(bench_shingles), "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    out = (
        train_sh.select("id", "n_shingles")
        .join(hits, "id", "left")
        .withColumn("n_matched", F.coalesce(F.col("n_matched"), F.lit(0)))
        .withColumn(
            "overlap_frac",
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_matched").cast("double") / F.col("n_shingles"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "contaminated",
            (F.col("n_matched") >= min_hits)
            & (F.col("overlap_frac") >= frac_threshold),
        )
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_shingles",
        "n_matched",
        "overlap_frac",
        "contaminated",
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 1,
    frac_threshold: float = 0.1,
) -> DataFrame:
    """Return the training rows that survive decontamination (left-semi
    join against the clean ids — the corpus itself is never widened)."""
    clean = ngram_overlap(
        train, benchmark, id_col, text_col, n, min_hits, frac_threshold
    ).where(~F.col("contaminated")).select(id_col)
    return train.join(clean, id_col, "left_semi")
