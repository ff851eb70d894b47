"""Large-scale training-data pipeline operators (beyond the reference surface).

All operators are built from JVM-side built-in functions wherever possible —
per-row Python is reserved for genuinely opaque work (multimodal decode),
and even there it's Arrow-batched `mapInPandas`, never row-at-a-time UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    cores. CPU-heavy stages (shingling, signature aggs, GEMM batches) are
    otherwise serialized by small single-file inputs; at 100 TB inputs
    already carry thousands of partitions and this is a no-op (no shuffle
    is ever added on the large-data path)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min(target, 200):
        return df.repartition(min(target, 200))
    return df
