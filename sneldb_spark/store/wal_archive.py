"""WAL archiving (the reference's "conservative mode"): keep a compressed
copy of every write-ahead log before the post-flush cleaner deletes it.

Reference behavior (docs/src/design/wal_archiving.md, wal_cleaner.rs):
after a successful flush, each retired WAL file is serialized + compressed
into `archive_dir/wal-<logid>-<start>-<end>.wal.<ext>`; deletion happens
ONLY if archiving succeeded, and a CLI (`wal_archive_manager`) lists,
inspects, exports, and recovers archives.

Spark-first shape: an archive is a compressed JSON-lines file whose first
line is a header record and whose remaining lines are the original WAL
entries (`{"t": event_type, "r": row}`), so

- single archives open with stdlib tooling (the CLI in
  tools/wal_archive_manager.py), and
- bulk recovery is one distributed `spark.read.json` over the archive
  directory — codecs are decoded transparently per file, recovery of a
  100 TB archive set is an ordinary parallel scan, nothing driver-side.

Compression defaults to gzip: Spark reads .gz JSON natively on every
executor, so the documented distributed recovery path always works.
Zstandard is opt-in (`compression="zstd"`, requires the `zstandard`
package locally AND the Hadoop zstd codec on executors for
`recover_df`) — an environment that can pip-install zstandard but lacks
the Hadoop codec would otherwise archive data it cannot recover at
scale.
"""

from __future__ import annotations

import gzip
import json
import os
import time
from typing import IO, Iterator

try:  # optional: not in the baked environment; gzip is the fallback
    import zstandard as _zstd  # type: ignore

    _HAVE_ZSTD = True
except Exception:  # pragma: no cover - environment-dependent
    _zstd = None
    _HAVE_ZSTD = False

HEADER_KEY = "__wal_archive__"
FORMAT_VERSION = 1


def _open_write(path: str, level: int) -> IO[bytes]:
    if path.endswith(".zst"):
        cctx = _zstd.ZstdCompressor(level=level)
        return cctx.stream_writer(open(path, "wb"), closefd=True)
    return gzip.open(path, "wb", compresslevel=min(level, 9))


def _open_read(path: str) -> IO[bytes]:
    if path.endswith(".zst"):
        dctx = _zstd.ZstdDecompressor()
        return dctx.stream_reader(open(path, "rb"), closefd=True)
    return gzip.open(path, "rb")


def _ext(compression: str) -> str:
    return "wal.zst" if compression == "zstd" else "wal.gz"


def archive_wal_file(
    wal_path: str,
    archive_dir: str,
    log_id: int | None = None,
    compression_level: int = 3,
    compression: str = "gzip",
) -> str:
    """Compress one retired WAL (JSONL) file into `archive_dir` and return
    the archive path. The source file is NOT deleted — the caller deletes
    it only after this returns (reference: archive-then-delete, keep the
    WAL on any failure). `compression` is "gzip" (default, always
    Spark-recoverable) or "zstd" (opt-in, needs the zstandard package)."""
    if compression not in ("gzip", "zstd"):
        raise ValueError(f"unknown compression {compression!r}")
    if compression == "zstd" and not _HAVE_ZSTD:
        raise ValueError("zstd requested but the zstandard package is absent")
    entries: list[str] = []
    ts_min, ts_max = None, None
    with open(wal_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            entries.append(line)
            try:
                ts = json.loads(line).get("r", {}).get("timestamp")
            except (ValueError, AttributeError):
                ts = None
            if ts is not None:
                ts_min = ts if ts_min is None else min(ts_min, ts)
                ts_max = ts if ts_max is None else max(ts_max, ts)
    log_id = time.time_ns() if log_id is None else log_id
    header = {
        HEADER_KEY: FORMAT_VERSION,
        "log_id": log_id,
        "n_entries": len(entries),
        "ts_min": ts_min,
        "ts_max": ts_max,
        "compression": compression,
        "created_unix": int(time.time()),
        "source": os.path.basename(wal_path),
    }
    os.makedirs(archive_dir, exist_ok=True)
    name = f"wal-{log_id:020d}-{ts_min or 0}-{ts_max or 0}.{_ext(compression)}"
    path = os.path.join(archive_dir, name)
    tmp = path + ".tmp"
    with _open_write(tmp, compression_level) as out:
        out.write((json.dumps(header) + "\n").encode())
        for line in entries:
            out.write((line + "\n").encode())
    # write-then-rename so a crash mid-archive never leaves a file the
    # lister would treat as complete
    os.replace(tmp, path)
    return path


def list_archives(archive_dir: str) -> list[dict]:
    """Headers of every archive in the directory, sorted by log id."""
    out = []
    if not os.path.isdir(archive_dir):
        return out
    for fname in sorted(os.listdir(archive_dir)):
        if ".wal." not in fname or fname.endswith(".tmp"):
            continue
        path = os.path.join(archive_dir, fname)
        hdr = read_header(path)
        hdr["path"] = path
        hdr["bytes"] = os.path.getsize(path)
        out.append(hdr)
    return sorted(out, key=lambda h: h.get("log_id", 0))


def read_header(path: str) -> dict:
    import io

    with _open_read(path) as f:
        first = io.TextIOWrapper(f, encoding="utf-8").readline()
    hdr = json.loads(first)
    if HEADER_KEY not in hdr:
        raise ValueError(f"{path}: not a WAL archive (missing header)")
    return hdr


def iter_entries(path: str) -> Iterator[dict]:
    """Yield {"t": event_type, "r": row} records from one archive,
    streaming line-by-line (archives can be large)."""
    import io

    with _open_read(path) as f:
        text = io.TextIOWrapper(f, encoding="utf-8")
        for i, raw in enumerate(text):
            if i == 0 or not raw.strip():
                continue
            yield json.loads(raw)


def export_json(path: str, out_path: str) -> int:
    """Decompress one archive to plain JSONL (reference: `export`)."""
    n = 0
    with open(out_path, "w", encoding="utf-8") as out:
        for rec in iter_entries(path):
            out.write(json.dumps(rec) + "\n")
            n += 1
    return n


def recover_df(spark, archive_dir: str):
    """All archived WAL entries as a DataFrame — a distributed JSON scan
    over the archive directory (the 100 TB recovery path: no driver-side
    decompression, each archive file decodes in its own task). Header
    records are dropped by the `t IS NOT NULL` filter."""
    from pyspark.sql import functions as F

    df = (
        spark.read.option("pathGlobFilter", "wal-*.wal.*")
        .json(archive_dir)
    )
    if "t" not in df.columns:
        return df.limit(0)
    return df.where(F.col("t").isNotNull())
