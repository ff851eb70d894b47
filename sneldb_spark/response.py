"""Response rendering: the reference's wire formats.

JSON frame stream (reference: src/shared/response/json.rs:138-216):

    {"type": "schema", "columns": [...], "types": [...]}
    {"type": "batch", "rows": [[...], ...], "row_count": N}
    ...
    {"type": "end", "row_count": total}

Arrow IPC stream (reference: src/shared/response/arrow.rs:115-180): the
whole result as Arrow record batches.

Batches stream via `toLocalIterator`, so the driver never holds the full
result; batch size mirrors the reference's `streaming_batch_size = 1000`.
"""

from __future__ import annotations

import json
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame

STREAMING_BATCH_SIZE = 1000


def _json_cell(v):
    if v is None or isinstance(v, (str, bool, int)):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, list):
        return [_json_cell(x) for x in v]
    return str(v)


def _dumps(obj) -> str:
    # Compact separators to match the reference's sonic_rs output byte
    # shapes — scenario matchers check fragments like ',2]' that a
    # ', '-separated rendering would miss.
    return json.dumps(obj, separators=(",", ":"))


def _row_sources(df: DataFrame):
    """Iterate a result's rows, part-aware: a serve-then-refresh SHOW
    attaches `__sneldb_serve_parts__ = (stored, delta)` and the parts
    stream SEQUENTIALLY — the stored parquet scan's first task puts
    frames on the wire while the delta's join plan (the expensive
    planning work) hasn't been paid yet. Same rows, same order as
    iterating the union plan (stored partitions precede delta
    partitions there too)."""
    parts = getattr(df, "__sneldb_serve_parts__", None)
    for part in parts if parts is not None else (df,):
        yield from part.toLocalIterator()


def json_frames(df: DataFrame, batch_size: int = STREAMING_BATCH_SIZE) -> Iterator[str]:
    """Yield JSON frame lines for a result DataFrame."""
    schema = df.schema
    yield _dumps(
        {
            "type": "schema",
            "columns": [f.name for f in schema.fields],
            "types": [f.dataType.simpleString() for f in schema.fields],
        }
    )
    total = 0
    batch: list[list] = []
    for row in _row_sources(df):
        batch.append([_json_cell(v) for v in row])
        if len(batch) >= batch_size:
            total += len(batch)
            yield _dumps({"type": "batch", "rows": batch, "row_count": len(batch)})
            batch = []
    if batch:
        total += len(batch)
        yield _dumps({"type": "batch", "rows": batch, "row_count": len(batch)})
    yield _dumps({"type": "end", "row_count": total})


def arrow_ipc_bytes(df: DataFrame) -> bytes:
    """Whole result as an Arrow IPC stream (for `output_format = "arrow"`)."""
    import io

    import pyarrow as pa

    table = df.toArrow()
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue()


def arrow_ipc_frames(df: DataFrame, batch_size: int = STREAMING_BATCH_SIZE) -> Iterator[bytes]:
    """Yield an Arrow IPC stream incrementally: one chunk for the schema
    message, one per record batch, one for the end-of-stream marker
    (continuation + zero length — reference:
    src/shared/response/arrow.rs:115-180 ArrowStreamEncoder).

    Rows stream through `toLocalIterator` exactly like `json_frames`, so
    the driver holds at most `batch_size` rows — the line-protocol Arrow
    path never collects the result. The Arrow schema comes from a
    `limit(0)` collect (public API, Connect-compatible), which costs one
    empty job before the stream starts."""
    import io

    import pyarrow as pa

    probe = getattr(df, "__sneldb_serve_parts__", (df,))[0]
    schema = probe.limit(0).toArrow().schema
    names = [f.name for f in df.schema.fields]
    sink = io.BytesIO()
    writer = pa.ipc.new_stream(sink, schema)

    def take() -> bytes:
        data = sink.getvalue()
        sink.seek(0)
        sink.truncate(0)
        return data

    def to_batch(rows: list) -> pa.RecordBatch:
        cols = list(zip(*rows))
        arrays = [
            pa.array(list(cols[i]), type=schema.field(i).type)
            for i in range(len(names))
        ]
        return pa.RecordBatch.from_arrays(arrays, schema=schema)

    yield take()  # schema message
    batch: list = []
    for row in _row_sources(df):
        batch.append(tuple(row))
        if len(batch) >= batch_size:
            writer.write_batch(to_batch(batch))
            yield take()
            batch = []
    if batch:
        writer.write_batch(to_batch(batch))
        yield take()
    writer.close()
    tail = take()
    if tail:
        yield tail  # end-of-stream marker
