"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as `binary` columns next to typed metadata
(mime, width, height, duration, ...). The Spark-side machinery —
schema, partition-friendly layout, Arrow-batched UDF signatures, batch
shapes — is real and tested; the actual codec work is stubbed because the
decode libraries (PIL/ffmpeg/...) are not in this container. Each stub is
either `NotImplementedError` (real decode) or a deterministic fake
(pipeline testing), clearly marked.

All per-item work runs through `mapInPandas` so binary blobs move as Arrow
buffers in batches — never row-at-a-time Python pickling. At 100 TB the
decode stage is embarrassingly parallel; the only planning concern is
batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`) versus blob
size, which callers tune per modality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(data: bytes) -> "object":
    """Real image decode — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this environment"
    )


def _fake_feature(data: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from the bytes (stands in for a model
    forward pass so the pipeline shape is testable end to end)."""
    import hashlib

    h = hashlib.sha256(data or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over binary media rows.

    Input must match MEDIA_SCHEMA; output matches FEATURE_SCHEMA. The
    digest and byte-length are real; the feature vector is the
    deterministic fake above (swap `_fake_feature` for a model call)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            data = pdf["data"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": data.map(lambda b: len(b) if b is not None else 0),
                    "content_digest": data.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": data.map(_fake_feature),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp (real decode stubbed; timestamps are computed from metadata
    so partitioning/explode shape is real)."""
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(F.coalesce(F.col("meta_duration_ms"), F.lit(0)) - 1, F.lit(0)),
            F.lit(every_ms),
        ),
        lambda t: t.cast("long"),
    )
    return (
        df.withColumn("frame_ts_ms", F.explode(frames))
        .select("media_id", "mime", "frame_ts_ms")
    )
