"""Offline storage inspector — the counterpart of the reference's
`convertor` debugger binary (src/bin/convertor.rs, src/shared/debugger/
convertor.rs), re-expressed for a Parquet-native layout.

The reference tool dumps its proprietary on-disk structures (zone
metadata, compressed column indexes, XOR filters, enum bitmap indexes,
schema stores) as JSON so an operator can see exactly what the pruning
machinery sees. Our engine's equivalents live in Parquet footers — row
group boundaries instead of zones, footer min/max statistics instead of
zone metadata + XOR filters — plus JSON sidecars (WAL, schema store,
materialization manifests). Every report here is assembled from those
files directly with pyarrow; no Spark session, so the tool works on any
root, even while an engine holds it (reads only).

Mapping to the reference subcommands:
  convertor zone/index  -> rowgroups / footer   (what pruning sees)
  convertor col/offset  -> column               (per-row-group stats)
  convertor xorfilter   -> column               (footer min/max + bloom)
  convertor schemas /
            schema_records -> schemas           (schema store records)
  (new, same spirit)    -> segments, wal, materialized
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow.parquet as pq


def _jsonable(v: Any) -> Any:
    """Footer statistics surface as python objects (bytes for BYTE_ARRAY
    columns); make them JSON-printable without losing information."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if hasattr(v, "isoformat"):  # datetime.datetime from timestamp cols
        return v.isoformat()
    return v


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


# -- footer / rowgroups / column (convertor zone / col / xorfilter) ------


def footer_report(path: str) -> dict:
    """Full footer dump for one Parquet file: schema, row groups, and
    per-column-chunk statistics — the exact information Spark's scan uses
    for row-group pruning (our zone metadata)."""
    f = pq.ParquetFile(path)
    md = f.metadata
    groups = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        cols = {}
        for c in range(rg.num_columns):
            col = rg.column(c)
            st = col.statistics
            cols[col.path_in_schema] = {
                "compression": col.compression,
                "encodings": list(col.encodings),
                "compressed_bytes": col.total_compressed_size,
                "uncompressed_bytes": col.total_uncompressed_size,
                "stats": None
                if st is None
                else {
                    "min": _jsonable(st.min) if st.has_min_max else None,
                    "max": _jsonable(st.max) if st.has_min_max else None,
                    "nulls": st.null_count if st.has_null_count else None,
                    "distinct": st.distinct_count
                    if st.has_distinct_count
                    else None,
                },
            }
        groups.append(
            {"rows": rg.num_rows, "bytes": rg.total_byte_size, "columns": cols}
        )
    return {
        "path": path,
        "format_version": md.format_version,
        "created_by": md.created_by,
        "num_rows": md.num_rows,
        "num_row_groups": md.num_row_groups,
        "schema": [
            {"name": s.name, "physical": s.physical_type, "logical": str(s.logical_type)}
            for s in (md.schema.column(i) for i in range(md.num_columns))
        ],
        "row_groups": groups,
    }


def column_report(path: str, field: str) -> dict:
    """Per-row-group statistics for ONE column across a file or segment
    directory — the view the reference's `convertor col` / `xorfilter`
    give per zone. This is precisely the information a point predicate
    (`WHERE field = x`) is pruned against."""
    files = _parquet_files(path)
    out = []
    for fp in files:
        f = pq.ParquetFile(fp)
        md = f.metadata
        try:
            idx = md.schema.names.index(field)
        except ValueError:
            continue
        for g in range(md.num_row_groups):
            col = md.row_group(g).column(idx)
            st = col.statistics
            out.append(
                {
                    "file": os.path.relpath(fp, path) if os.path.isdir(path) else fp,
                    "row_group": g,
                    "rows": md.row_group(g).num_rows,
                    "min": _jsonable(st.min) if st is not None and st.has_min_max else None,
                    "max": _jsonable(st.max) if st is not None and st.has_min_max else None,
                    "nulls": st.null_count
                    if st is not None and st.has_null_count
                    else None,
                }
            )
    return {"field": field, "chunks": out}


# -- segments (per-event-type rollup) ------------------------------------


def segment_report(root: str) -> dict:
    """One row per event type under <root>/events: file/row/byte counts
    and the ts / event_id envelope, all from footers (one LIST + footer
    reads — no data pages touched)."""
    events = os.path.join(root, "events")
    types = {}
    if os.path.isdir(events):
        for name in sorted(os.listdir(events)):
            d = os.path.join(events, name)
            if not os.path.isdir(d) or name.endswith((".old", ".staging")):
                continue
            files = _parquet_files(d)
            rows = 0
            nbytes = 0
            ts_min = ts_max = id_min = id_max = None
            for fp in files:
                md = pq.ParquetFile(fp).metadata
                rows += md.num_rows
                nbytes += os.path.getsize(fp)
                names = md.schema.names
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    for fld in ("timestamp", "event_id"):
                        if fld not in names:
                            continue
                        st = rg.column(names.index(fld)).statistics
                        if st is None or not st.has_min_max:
                            continue
                        if fld == "timestamp":
                            ts_min = st.min if ts_min is None else min(ts_min, st.min)
                            ts_max = st.max if ts_max is None else max(ts_max, st.max)
                        else:
                            id_min = st.min if id_min is None else min(id_min, st.min)
                            id_max = st.max if id_max is None else max(id_max, st.max)
            types[name] = {
                "files": len(files),
                "rows": rows,
                "bytes": nbytes,
                "ts_min": _jsonable(ts_min),
                "ts_max": _jsonable(ts_max),
                "event_id_min": id_min,
                "event_id_max": id_max,
            }
    return {"root": root, "event_types": types}


# -- wal -----------------------------------------------------------------


def wal_report(root: str) -> dict:
    """Per-WAL-file entry counts and per-type breakdown (the un-flushed
    durability tail an engine would replay on open)."""
    wal_dir = os.path.join(root, "wal")
    files = []
    if os.path.isdir(wal_dir):
        for name in sorted(os.listdir(wal_dir)):
            fp = os.path.join(wal_dir, name)
            if not os.path.isfile(fp):
                continue
            n = 0
            by_type: dict[str, int] = {}
            bad = 0
            with open(fp, "r", encoding="utf-8", errors="replace") as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                        n += 1
                        t = rec.get("t", "?")
                        by_type[t] = by_type.get(t, 0) + 1
                    except json.JSONDecodeError:
                        bad += 1
            files.append(
                {
                    "file": name,
                    "bytes": os.path.getsize(fp),
                    "entries": n,
                    "corrupt_lines": bad,
                    "by_type": by_type,
                }
            )
    return {"wal_dir": wal_dir, "files": files}


# -- schema store --------------------------------------------------------


def schemas_report(path: str) -> dict:
    """Schema-store records (the reference's `convertor schemas` /
    `schema_records`). Routes through the registry's diagnose pass so the
    output includes validity, not just raw JSON."""
    from sneldb_spark.schema.registry import diagnose_store

    return diagnose_store(path)


# -- materializations ----------------------------------------------------


def materialized_report(root: str) -> dict:
    """One row per materialization under <root>/materialized: manifest
    summary + stored rows/bytes from footers."""
    mroot = os.path.join(root, "materialized")
    mats = {}
    if os.path.isdir(mroot):
        for name in sorted(os.listdir(mroot)):
            d = os.path.join(mroot, name)
            man_path = os.path.join(d, "manifest.json")
            if not os.path.isfile(man_path):
                continue
            try:
                with open(man_path, "r", encoding="utf-8") as fh:
                    man = json.load(fh)
            except json.JSONDecodeError:
                mats[name] = {"error": "corrupt manifest"}
                continue
            files = _parquet_files(d)
            rows = sum(pq.ParquetFile(fp).metadata.num_rows for fp in files)
            nbytes = sum(os.path.getsize(fp) for fp in files)
            q = man.get("query") or {}
            if q.get("compare"):
                kind = "compare"
            elif q.get("aggs") and q.get("sequence", {}).get("links"):
                kind = "sequence_agg"
            elif q.get("aggs"):
                kind = "aggregate"
            elif q.get("sequence", {}).get("links"):
                kind = "sequence"
            else:
                kind = "segment"
            head = (q.get("queries") or [q])[0].get("sequence", {}).get("head")
            mats[name] = {
                "kind": kind,
                "event_type": head,
                "hwm_ts": man.get("hwm_ts"),
                "hwm_id": man.get("hwm_id"),
                "max_rows": man.get("max_rows"),
                "max_age_seconds": man.get("max_age_seconds"),
                "files": len(files),
                "rows": rows,
                "bytes": nbytes,
            }
    return {"root": mroot, "materializations": mats}
