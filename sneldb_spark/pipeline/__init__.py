"""Large-scale training-data pipeline operators (beyond the reference surface).

All operators are built from JVM-side built-in functions wherever possible —
per-row Python is reserved for genuinely opaque work (multimodal decode),
and even there it's Arrow-batched `mapInPandas`, never row-at-a-time UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_parallelism(spark) -> int:
    """Core count of the cluster, Connect-safe (falls back to the
    shuffle-partition conf when no sparkContext is exposed)."""
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        try:
            return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        except (ValueError, TypeError):
            return 200


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    cores. CPU-heavy stages (shingling, signature aggs, GEMM batches) are
    otherwise serialized by small single-file inputs; at 100 TB inputs
    already carry thousands of partitions and this is a no-op (no shuffle
    is ever added on the large-data path)."""
    target = min_partitions
    if target is None:
        # Spark Connect exposes no sparkContext; the shuffle-partition
        # conf is the same order of magnitude and always readable —
        # but may be non-numeric (e.g. "auto" under some AQE setups)
        target = cluster_parallelism(df.sparkSession)
    target = min(target, 200)
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        # Connect: no RDD probe — keep the plan untouched rather than
        # risk adding a shuffle to an already-wide input
        return df
    if current < target:
        return df.repartition(target)
    return df
