"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride as `binary` columns next to typed metadata
(mime, width, height, duration, ...). The Spark-side machinery —
schema, partition-friendly layout, Arrow-batched UDF signatures, batch
shapes — is real and tested. Codec work splits three ways:

- UNCOMPRESSED formats decode for real with the BUILT-IN library-free
  codecs (pipeline/codecs.py): P6 PPM images (decode/resize/re-encode)
  and PCM WAV audio (`audio_features`) — exercised unmocked in tests.
- Compressed images route to the optional Pillow backend when installed
  (`codec="real"/"auto"`), else raise `NotImplementedError`.
- Deterministic fakes remain for pipeline-shape testing where no codec
  applies (`codec="fake"`), clearly marked.

All per-item work runs through `mapInPandas` so binary blobs move as Arrow
buffers in batches — never row-at-a-time Python pickling. At 100 TB the
decode stage is embarrassingly parallel; the only planning concern is
batch size (`spark.sql.execution.arrow.maxRecordsPerBatch`) versus blob
size, which callers tune per modality.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sneldb_spark.pipeline import ensure_min_partitions

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


def _imaging():
    """The optional codec backend (feature-flag probe): Pillow when
    importable, else None. Not baked into this container — every API
    below keeps a deterministic stub path so plumbing stays testable and
    the oracle gates stay codec-independent."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except Exception:
        return None


def have_image_codec() -> bool:
    return _imaging() is not None


def decode_image(data: bytes) -> "object":
    """Real image decode via the optional Pillow backend; raises
    NotImplementedError when no codec is installed."""
    image_mod = _imaging()
    if image_mod is None:
        raise NotImplementedError(
            "image decode requires Pillow; pip install pillow to enable"
        )
    import io

    return image_mod.open(io.BytesIO(data))


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

    return ensure_min_partitions(df).mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame, max_width: int = 256, max_height: int = 256,
    codec: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize plumbing (aspect-preserving fit into
    max_width x max_height).

    The geometry — target dimensions, pass-through of already-small
    images — is real and computed from metadata. The pixel work follows
    `codec`:

    - "fake" (default): deterministic payload whose length scales with
      the target area — batch shapes and memory behavior downstream stay
      representative, and the oracle gates stay codec-independent.
    - "real": decode + resize + re-encode. Uncompressed P6 PPM payloads
      go through the BUILT-IN pure-numpy codec (pipeline/codecs.py —
      works everywhere, no library); anything else routes to the
      optional Pillow backend and raises on executors if it is absent.
    - "auto": "real" when Pillow is importable on the driver, else
      "fake" (conservative: a mixed-format corpus without Pillow would
      fail per-item; pass "real" explicitly for all-PPM corpora).
    """
    if codec == "auto":
        codec = "real" if have_image_codec() else "fake"
    if codec not in ("real", "fake"):
        raise ValueError(f"unknown codec mode {codec!r}")
    use_real = codec == "real"

    def _real_resize(data: bytes, w: int, h: int) -> bytes:
        from sneldb_spark.pipeline.codecs import is_ppm, resize_ppm

        if is_ppm(data):
            # built-in pure-numpy codec — no library needed for the
            # uncompressed format (pipeline/codecs.py)
            return resize_ppm(data, w, h)
        import io

        img = decode_image(data)
        fmt = img.format or "PNG"
        buf = io.BytesIO()
        img.resize((max(w, 1), max(h, 1))).save(buf, format=fmt)
        return buf.getvalue()

    def _fake_resize(data: bytes, need: int) -> bytes:
        # Deterministic stand-in: repeat the digest to ~1 byte/pixel.
        # The C-level bytes repeat is one memcpy burst; no per-pixel work.
        import hashlib

        seed = hashlib.sha256(data or b"").digest()
        need = max(need, 1)
        return (seed * (need // len(seed) + 1))[:need]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # Geometry is fully vectorized; pass-through rows never enter
            # Python row-at-a-time code (their bytes are reused as-is).
            w = pdf["meta_width"].fillna(0).to_numpy(dtype="int64")
            h = pdf["meta_height"].fillna(0).to_numpy(dtype="int64")
            small = (w <= max_width) & (h <= max_height)
            scale = np.minimum(
                max_width / np.maximum(w, 1), max_height / np.maximum(h, 1)
            )
            tw = np.where(small, w, np.maximum((w * scale).astype("int64"), 1))
            th = np.where(small, h, np.maximum((h * scale).astype("int64"), 1))
            data = pdf["data"].to_numpy(dtype=object)
            out = data.copy()
            need = tw * th
            for i in np.nonzero(~small)[0]:
                if use_real:
                    out[i] = _real_resize(data[i], int(tw[i]), int(th[i]))
                else:
                    out[i] = _fake_resize(data[i], int(need[i]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "mime": pdf["mime"].to_numpy(dtype=object),
                    "data": out,
                    "meta_width": pd.array(tw.astype("int32"), dtype="Int32"),
                    "meta_height": pd.array(th.astype("int32"), dtype="Int32"),
                }
            )

    return ensure_min_partitions(
        df.select("media_id", "mime", "data", "meta_width", "meta_height")
    ).mapInPandas(run, schema=RESIZED_SCHEMA)


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


def segment_audio(df: DataFrame, segment_ms: int = 5_000) -> DataFrame:
    """Audio segmentation plumbing: one row per fixed-length segment of
    each audio row, with exact sample counts from (duration, sample_rate)
    metadata — the shape a transcription/feature pipeline fans out over.
    The waveform decode is the documented stub (bytes stay opaque); the
    per-segment pseudo-loudness is a deterministic content-hash value so
    downstream ordering/filtering logic is testable cross-engine. All
    codegen (sequence/explode + md5 arithmetic): no Python, no shuffle."""
    dur = F.coalesce(F.col("meta_duration_ms"), F.lit(0))
    starts = F.sequence(
        F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(segment_ms)
    )
    seg = df.withColumn("seg_start_ms", F.explode(starts))
    seg_idx = (F.col("seg_start_ms") / segment_ms).cast("long")
    seg_ms = F.least(F.lit(segment_ms), dur - F.col("seg_start_ms"))
    n_samples = (seg_ms * F.coalesce(F.col("meta_sample_rate"), F.lit(0)) / 1000).cast(
        "long"
    )
    key = F.concat(F.col("media_id").cast("string"), F.lit("-"), seg_idx.cast("string"))
    loudness = (
        F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("long") % 1000
    ) / 1000.0
    return seg.select(
        "media_id",
        seg_idx.alias("seg_idx"),
        F.col("seg_start_ms").cast("long").alias("seg_start_ms"),
        seg_ms.cast("long").alias("seg_ms"),
        n_samples.alias("n_samples"),
        F.round(loudness, 3).alias("pseudo_loudness"),
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL waveform feature extraction for PCM WAV payloads via the
    built-in stdlib/numpy codec (pipeline/codecs.py) — no library, no
    stub: sample count, rate, RMS, and peak from the decoded samples.
    Arrow-batched mapInPandas over the binary column; rows whose payload
    is not a WAV yield nulls (decode errors are data, not crashes).

    The decode-free metadata path (`segment_audio`) remains the planner
    for formats the container can't decode; this is the honest real-path
    counterpart for the format it can."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sneldb_spark.pipeline.codecs import is_wav, wav_stats

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "n_samples": [], "sample_rate": [],
                "rms": [], "peak": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                out["media_id"].append(mid)
                try:
                    if data is None or not is_wav(bytes(data)):
                        raise ValueError("not wav")
                    n, rate, rms, peak = wav_stats(bytes(data))
                    out["n_samples"].append(n)
                    out["sample_rate"].append(rate)
                    out["rms"].append(rms)
                    out["peak"].append(peak)
                except Exception:
                    out["n_samples"].append(None)
                    out["sample_rate"].append(None)
                    out["rms"].append(None)
                    out["peak"].append(None)
            yield pd.DataFrame(out)

    return ensure_min_partitions(df.select("media_id", "data")).mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


AUDIO_SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("seg_idx", T.LongType(), True),
        T.StructField("seg_start_ms", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def audio_segment_features(df: DataFrame, segment_ms: int = 5_000) -> DataFrame:
    """REAL per-segment loudness for PCM WAV payloads: decode once per
    row (built-in codec), then vectorized per-segment RMS over the
    sample array — the real-bytes counterpart of `segment_audio`'s
    metadata-only planner. One output row per segment; non-WAV rows are
    dropped (they have no decodable segments)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sneldb_spark.pipeline.codecs import decode_wav, is_wav

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "seg_idx": [], "seg_start_ms": [],
                "n_samples": [], "rms": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                try:
                    if data is None or not is_wav(bytes(data)):
                        continue
                    samples, rate = decode_wav(bytes(data))
                except Exception:
                    continue
                per = max(int(rate * segment_ms / 1000), 1)
                x = samples.astype(np.float64)
                if not len(x):
                    # a valid WAV with zero frames has no segments —
                    # strictly one output row per REAL segment (ADVICE r5)
                    continue
                for i in range(0, len(x), per):
                    seg = x[i : i + per]
                    out["media_id"].append(mid)
                    out["seg_idx"].append(i // per)
                    out["seg_start_ms"].append(int(i * 1000 / rate))
                    out["n_samples"].append(len(seg))
                    out["rms"].append(
                        float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0
                    )
            yield pd.DataFrame(out)

    return ensure_min_partitions(df.select("media_id", "data")).mapInPandas(
        run, schema=AUDIO_SEGMENT_SCHEMA
    )


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("brightness", T.DoubleType(), True),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL pixel statistics for P6 PPM payloads via the built-in codec:
    decoded dimensions, per-channel means, luma brightness (Rec. 601).
    Non-PPM rows yield nulls. The filtering signal real image-curation
    pipelines threshold on (too dark / blank / extreme aspect)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sneldb_spark.pipeline.codecs import decode_ppm, is_ppm

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [], "brightness": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                out["media_id"].append(mid)
                try:
                    if data is None or not is_ppm(bytes(data)):
                        raise ValueError("not ppm")
                    arr = decode_ppm(bytes(data)).astype(np.float64)
                    means = arr.mean(axis=(0, 1))
                    out["width"].append(arr.shape[1])
                    out["height"].append(arr.shape[0])
                    out["mean_r"].append(float(means[0]))
                    out["mean_g"].append(float(means[1]))
                    out["mean_b"].append(float(means[2]))
                    out["brightness"].append(
                        float(0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2])
                    )
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_r"].append(None)
                    out["mean_g"].append(None)
                    out["mean_b"].append(None)
                    out["brightness"].append(None)
            yield pd.DataFrame(out)

    return ensure_min_partitions(df.select("media_id", "data")).mapInPandas(
        run, schema=IMAGE_STATS_SCHEMA
    )


def media_dedup(df: DataFrame, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Exact media dedup by content digest — the first pass of every
    image/audio/video pipeline (collapse byte-identical blobs BEFORE any
    decode or model forward). All JVM codegen: sha2 over the binary
    column, one digest-keyed window to pick the canonical copy
    (min id), map-side-combined count per digest. No Python touches the
    blobs; one shuffle on the digest.

    Output: (media_id, content_digest, dup_count, is_canonical)."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(id_col).alias("media_id"),
        F.lower(F.sha2(F.col(data_col), 256)).alias("content_digest"),
    )
    w = Window.partitionBy("content_digest")
    return (
        hashed.withColumn("dup_count", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col("media_id") == F.min("media_id").over(w))
        .select("media_id", "content_digest", "dup_count", "is_canonical")
    )
