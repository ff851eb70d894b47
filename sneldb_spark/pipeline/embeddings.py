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


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[int, list[float], list[list[float]]]:
    """(n, mean, covariance) of an embedding column in ONE distributed
    pass: per-Arrow-batch partial sums of v and v v^T reduce to d + d*d
    numbers per batch — only O(d^2) ever reaches the driver, never rows.
    Population covariance (divide by n), the PCA convention."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("embedding_moments on an empty frame")
    d = len(first[0])

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0)],
                    "ss": [(m.T @ m).reshape(-1)],
                }
            )

    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = df.select(vec_col).mapInPandas(partials, schema=schema).collect()
    n = sum(r["n"] for r in rows)
    s = np.zeros(d)
    ss = np.zeros(d * d)
    for r in rows:
        s += np.array(r["s"])
        ss += np.array(r["ss"])
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    return n, mean.tolist(), cov.tolist()


def pca_project(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto their top-k principal components —
    the standard dimensionality-reduction step before ANN serving or
    clustering. The covariance reduces to the driver (O(d^2), see
    embedding_moments), the eigendecomposition is numpy-local, and the
    projection streams per Arrow batch as one GEMM against the broadcast
    (d x k) basis. Components are sign-normalized (largest-|coefficient|
    entry positive) so output is deterministic across BLAS builds."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    _, mean, cov = embedding_moments(df, vec_col)
    mean_v = np.array(mean)
    vals, vecs = np.linalg.eigh(np.array(cov))
    order = np.argsort(vals)[::-1][:k]
    basis = vecs[:, order]  # (d, k)
    for j in range(basis.shape[1]):
        i = int(np.abs(basis[:, j]).argmax())
        if basis[i, j] < 0:
            basis[:, j] = -basis[:, j]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mean_v
            proj = m @ basis
            yield pd.DataFrame(
                {"id": pdf[id_col], "pca": [row for row in proj.astype(np.float32)]}
            )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("pca", T.ArrayType(T.FloatType())),
        ]
    )
    return df.select(id_col, vec_col).mapInPandas(project, schema=schema)
