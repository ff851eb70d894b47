"""Top-k file skipping for `ORDER BY <col> LIMIT n` (the reference's RLTE
zone index, reference: src/engine/core/zone/rlte_index.rs:7-60 and
engine/query/rlte_planner.rs, re-expressed over Parquet footers).

Spark's TakeOrderedAndProject gives the ordered-merge-with-limit part for
free, but it still SCANS every file. At 100 TB a `ORDER BY timestamp
LIMIT 100` should open a handful of files, not the fleet. Parquet already
stores per-row-group min/max/null statistics in the footer — the same
metadata the reference's RLTE index persists per zone — so the planner
can bound the answer from footers alone:

1. Read each file's footer (metadata-sized IO, threaded; the data pages
   are never touched).
2. Derive a value bound B such that at least n rows are guaranteed to
   order at-or-before B: sort files by their WEAKEST guaranteed value in
   scan order (min for DESC, max for ASC) and accumulate non-null row
   counts until n is reached.
3. Keep only files whose range crosses B (max >= B for DESC, min <= B
   for ASC); every dropped file provably contains no top-n row.

Conservative by construction: files with missing stats are always kept
and never counted toward the guarantee; ASC keeps every file containing
nulls (Spark sorts nulls FIRST ascending, and footer stats say nothing
about where nulls order). If fewer than n rows are guaranteed, nothing
is pruned. The pruned read returns a SUPERSET of the top-n rows by the
order column — the query's normal orderBy+limit runs unchanged on top.

The footer sweep is driver-side but metadata-scale (the reference's RLTE
planner is likewise an index-only pass); `max_files` caps it so a
pathological million-file table falls back to the full scan rather than
a slow plan.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass


@dataclass(frozen=True)
class FileStat:
    path: str
    rows: int
    cmin: object  # None when any row group lacks stats for the column
    cmax: object
    nulls: int  # null count for the column; rows counts non-null below


def _file_stat(path: str, column: str) -> FileStat:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = None
    for j in range(md.num_columns):
        if md.row_group(0).column(j).path_in_schema == column:
            idx = j
            break
    if idx is None:
        return FileStat(path, md.num_rows, None, None, 0)
    cmin = cmax = None
    nulls = 0
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(idx).statistics
        if st is None or not st.has_min_max:
            return FileStat(path, md.num_rows, None, None, 0)
        nulls += st.null_count or 0
        cmin = st.min if cmin is None else min(cmin, st.min)
        cmax = st.max if cmax is None else max(cmax, st.max)
    return FileStat(path, md.num_rows, cmin, cmax, nulls)


def collect_file_stats(
    root: str, column: str, max_files: int = 100_000, max_workers: int = 16,
    storage=None,
) -> list[FileStat] | None:
    """Footer stats for every parquet file under `root` (recursing through
    partition dirs), or None when the sweep should not be attempted
    (too many files / unreadable footer). The file enumeration goes
    through the storage layer (store/storage.py): local = os.walk,
    object store = one LIST over the prefix."""
    if storage is None:
        from sneldb_spark.store.storage import LOCAL as storage
    paths: list[str] = []
    for p in storage.walk_parquet(root):
        paths.append(p)
        if len(paths) > max_files:
            return None
    if not paths:
        return None
    try:
        with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
            return list(ex.map(lambda p: _file_stat(p, column), paths))
    except Exception:
        return None


def select_topk_files(
    stats: list[FileStat], n: int, desc: bool
) -> tuple[list[str], object]:
    """(paths guaranteed to contain every top-n row, value bound B).
    Returns all paths when no safe bound exists."""
    all_paths = [s.path for s in stats]
    if n <= 0:
        return all_paths, None
    known = [s for s in stats if s.cmin is not None]
    if desc:
        # nulls sort LAST under desc — null rows can't displace top-n,
        # but they must not count toward the >= B guarantee either.
        ranked = sorted(known, key=lambda s: s.cmin, reverse=True)
    else:
        # nulls sort FIRST under asc: a single null anywhere may be a
        # top-n row, so null-bearing files are unprunable, and no bound
        # can be derived past them (their non-null values still count).
        ranked = sorted(known, key=lambda s: s.cmax)
    guaranteed = 0
    bound = None
    for s in ranked:
        guaranteed += s.rows - s.nulls
        if guaranteed >= n:
            bound = s.cmin if desc else s.cmax
            break
    if bound is None:
        return all_paths, None
    keep = []
    for s in stats:
        if s.cmin is None:  # unknown stats: never prune
            keep.append(s.path)
        elif not desc and s.nulls > 0:  # asc: nulls order first
            keep.append(s.path)
        elif desc and s.cmax >= bound:
            keep.append(s.path)
        elif not desc and s.cmin <= bound:
            keep.append(s.path)
    return keep, bound


def columns_max(
    root: str, columns: list[str], max_files: int = 100_000, max_workers: int = 16,
    storage=None,
) -> dict[str, object] | None:
    """Per-column MAX over every parquet file under `root` from footer
    stats alone — the high-water-mark probe for incremental refresh.
    A full-scan `agg(max(...))` over 100 TB just to learn "did anything
    arrive?" defeats the point of a delta refresh; footers answer it at
    metadata cost (the same trick the reference's high_water.rs plays
    with its zone metadata). Returns None when any row group lacks stats
    for a requested column (caller falls back to the scan)."""
    import pyarrow.parquet as pq

    if storage is None:
        from sneldb_spark.store.storage import LOCAL as storage
    paths: list[str] = []
    for p in storage.walk_parquet(root):
        paths.append(p)
        if len(paths) > max_files:
            return None
    if not paths:
        return {c: None for c in columns}

    def file_maxes(path: str) -> dict[str, object] | None:
        md = pq.ParquetFile(path).metadata
        idx = {}
        for j in range(md.num_columns):
            name = md.row_group(0).column(j).path_in_schema
            if name in columns:
                idx[name] = j
        if set(idx) != set(columns):
            return None
        out: dict[str, object] = {}
        for name, j in idx.items():
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(j).statistics
                if st is None or not st.has_min_max:
                    return None
                out[name] = st.max if name not in out else max(out[name], st.max)
        return out

    try:
        with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
            per_file = list(ex.map(file_maxes, paths))
    except Exception:
        return None
    if any(m is None for m in per_file):
        return None
    agg: dict[str, object] = {}
    for m in per_file:
        for name, v in m.items():
            if v is not None:
                agg[name] = v if name not in agg else max(agg[name], v)
    return {c: agg.get(c) for c in columns}


def select_context_files(stats: list[FileStat], value) -> list[str]:
    """Files that can contain rows whose column equals `value` — footer
    min/max point-lookup pruning for FOR / REPLAY context queries (the
    reference routes a context to one shard and then zone-skips inside it,
    reference: src/engine/shard/manager.rs:58-61 + zone_meta.rs; here the
    (context_id, timestamp)-sorted file layout gives each file a tight
    context range, so most files exclude the value from footers alone).
    Unlike top-k pruning this is safe under ANY additional filters: the
    kept set is a superset of every row with that exact value. Files
    without stats are always kept; incomparable stats types never prune.
    """
    keep = []
    for s in stats:
        if s.cmin is None:
            keep.append(s.path)
            continue
        try:
            inside = s.cmin <= value <= s.cmax
        except TypeError:
            inside = True
        if inside or s.nulls > 0 and value is None:
            keep.append(s.path)
    return keep
