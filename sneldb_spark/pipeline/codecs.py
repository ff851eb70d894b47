"""Built-in media codecs for UNCOMPRESSED formats — pure numpy/stdlib,
no external libraries, so the multimodal pipeline's "real" path is
exercisable anywhere (the container has no Pillow/ffmpeg).

Covered:
- PPM (P6, binary RGB) images: decode / encode / nearest-neighbor resize.
- WAV (PCM) audio: decode to int16 samples + sample rate (stdlib `wave`).

Compressed formats (PNG/JPEG/MP3/...) still route to the optional Pillow
backend in multimodal.py — entropy coding is a library problem, not
something to hand-roll. The split keeps honesty: what we decode here IS
a real decode of a real format, and what we can't decode raises.
"""

from __future__ import annotations

import io
import wave

import numpy as np

PPM_MAGIC = b"P6"
WAV_MAGIC = b"RIFF"


def is_ppm(data: bytes) -> bool:
    return bool(data) and data[:2] == PPM_MAGIC


def is_wav(data: bytes) -> bool:
    return bool(data) and data[:4] == WAV_MAGIC


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM -> (height, width, 3) uint8 array. Handles the standard
    header (magic, whitespace/comments, width, height, maxval<=255)."""
    if not is_ppm(data):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header fields
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by the built-in codec")
    need = width * height * 3
    raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return raw.reshape(height, width, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_ppm wants (h, w, 3)")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center sampling) —
    the library-free resampler; bit-identical on every platform."""
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(th) + 0.5) * h / th).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(tw) + 0.5) * w / tw).astype(np.int64), w - 1)
    return arr[ys][:, xs]


def resize_ppm(data: bytes, tw: int, th: int) -> bytes:
    return encode_ppm(resize_nearest(decode_ppm(data), max(tw, 1), max(th, 1)))


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples[int16, frames x channels flattened], rate)."""
    with wave.open(io.BytesIO(data)) as f:
        rate = f.getframerate()
        width = f.getsampwidth()
        frames = f.readframes(f.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif width == 1:  # 8-bit WAV is unsigned; center to int16 range
        samples = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
        ) * 256
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(channels)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def wav_stats(data: bytes) -> tuple[int, int, float, int]:
    """(n_samples, sample_rate, rms, peak) of a PCM WAV payload."""
    samples, rate = decode_wav(data)
    if len(samples) == 0:
        return 0, rate, 0.0, 0
    x = samples.astype(np.float64)
    return (
        int(len(samples)),
        int(rate),
        float(np.sqrt(np.mean(x * x))),
        int(np.max(np.abs(samples))),
    )
